"""Custom stateful streaming operator: per-conversation signature state
maintained with ``applyInPandasWithState`` (SURVEY.md §2.8 engine
addition — the arbitrary-stateful path, complementing the
``foreachBatch`` merge in :mod:`.ingest`).

Semantics (identical to the batch stage / the store merge):

* state per ``conv_id`` = the set of turns seen so far, deduped on
  ``turn_idx`` with the struct-min winner (at-least-once safety);
* every micro-batch that touches a conversation emits ONE updated row
  ``(conv_id, sig_text, n_turns)`` with the turns joined in stable
  ``turn_idx`` order — downstream sees an always-current signatures
  changelog (output mode ``update``);
* state is bounded per conversation by its turn count; a production
  deployment adds ``GroupStateTimeout`` keyed off the event-time
  watermark to retire conversations that stopped arriving (wired here
  as processing-time-less NoTimeout because the sandbox replays finite
  drops; the watermark still bounds the shuffle buffer).

Scale: state lives in the state store partitioned by conv_id — the same
hash partitioning the batch groupBy uses; no driver involvement, each
micro-batch touches only the groups present in it.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "conv_id string, sig_text string, n_turns int"
STATE_SCHEMA = "turn_idx array<int>, text array<string>, ts array<long>"


def _update_signature(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    """Merge this batch's turns for one conversation into state and emit
    the refreshed signature row.

    Winner per turn_idx is the struct-min on (text, ts) with Spark's
    NULLS FIRST ordering (a null ts ranks below any epoch — identical to
    the ``F.min(struct(...))`` merge in :mod:`.ingest`), implemented as
    one vectorized sort + drop_duplicates, no per-row Python."""
    import numpy as np

    (conv_id,) = key
    frames = []
    if state.exists:
        idxs, texts, tss = state.get
        frames.append(
            pd.DataFrame(
                {
                    "turn_idx": pd.array(list(idxs), dtype="int64"),
                    "text": list(texts),
                    "ts_epoch": pd.array(list(tss), dtype="Int64"),
                }
            )
        )
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        ts_vals = pd.to_datetime(pdf["ts"]).to_numpy(dtype="datetime64[ns]")
        epoch = pd.array(ts_vals.astype("int64"), dtype="Int64")
        epoch[np.isnat(ts_vals)] = pd.NA
        frames.append(
            pd.DataFrame(
                {
                    "turn_idx": pdf["turn_idx"].astype("int64").to_numpy(),
                    # str() coercion mirrors the stored-state dtype (state
                    # schema is array<string>)
                    "text": [str(t) for t in pdf["text"]],
                    "ts_epoch": epoch,
                }
            )
        )
    merged = (
        pd.concat(frames, ignore_index=True)
        if frames
        else pd.DataFrame(
            {
                "turn_idx": pd.array([], dtype="int64"),
                "text": pd.array([], dtype=object),
                "ts_epoch": pd.array([], dtype="Int64"),
            }
        )
    )
    # na_position='first' = Spark NULLS FIRST: a null ts is the struct-min
    # against any concrete epoch (the old tuple compare raised TypeError
    # on None-vs-int here)
    merged = (
        merged.sort_values(
            ["turn_idx", "text", "ts_epoch"], na_position="first", kind="stable"
        )
        .drop_duplicates("turn_idx", keep="first")
        .reset_index(drop=True)
    )
    state.update(
        (
            [int(i) for i in merged["turn_idx"]],
            list(merged["text"]),
            [None if pd.isna(s) else int(s) for s in merged["ts_epoch"]],
        )
    )
    sig_text = " ".join(merged["text"])
    yield pd.DataFrame(
        {"conv_id": [conv_id], "sig_text": [sig_text], "n_turns": [len(merged)]}
    )


def stateful_signature_stream(stream: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """transcript stream → per-conversation signature changelog via the
    arbitrary-stateful operator. Caller attaches the sink:

        stateful_signature_stream(read_transcript_stream(spark, src))
            .writeStream.outputMode("update")...
    """
    return (
        stream.withWatermark("ts", watermark)
        .groupBy("conv_id")
        .applyInPandasWithState(
            _update_signature,
            OUTPUT_SCHEMA,
            STATE_SCHEMA,
            "update",
            GroupStateTimeout.NoTimeout,
        )
    )


def run_stateful_signatures(
    spark: Any,
    source_path: str,
    out_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
):
    """Wire source → stateful operator → parquet changelog sink with an
    availableNow trigger; returns the StreamingQuery. The LAST update
    per conv_id in the changelog is the current signature (dedupe with
    max_by(batch ordering) or read through :func:`latest_signatures`)."""
    from .ingest import read_transcript_stream

    stream = read_transcript_stream(spark, source_path)
    updates = stateful_signature_stream(stream, watermark)
    from pyspark.sql import functions as F

    def _append(batch: DataFrame, epoch: int) -> None:
        # stamp the epoch: the changelog needs an ORDER so the collapse
        # picks the latest state even when an update changed only the
        # text of an existing turn (n_turns unchanged)
        batch.withColumn("epoch", F.lit(int(epoch))).write.mode("append").parquet(
            out_path
        )

    return (
        updates.writeStream.outputMode("update")
        # parquet rejects update mode; appending each batch's update rows
        # IS the changelog (Kafka/Delta-CDF in production)
        .foreachBatch(_append)
        .option("checkpointLocation", checkpoint_path)
        .trigger(availableNow=True)
        .start()
    )


def latest_signatures(spark: Any, out_path: str) -> DataFrame:
    """Collapse the changelog to the current signature per conversation:
    the LATEST epoch wins — a redelivery that changed only a turn's text
    (struct-min winner replacement at unchanged n_turns) must supersede
    the earlier row, so recency, not turn count, is the order."""
    from pyspark.sql import functions as F

    log = spark.read.parquet(out_path)
    return (
        log.groupBy("conv_id")
        .agg(F.max(F.struct("epoch", "n_turns", "sig_text")).alias("w"))
        .select(
            "conv_id",
            F.col("w.sig_text").alias("sig_text"),
            F.col("w.n_turns").alias("n_turns"),
        )
    )
