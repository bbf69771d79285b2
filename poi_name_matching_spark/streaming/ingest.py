"""Streaming ingest of transcripts → incrementally maintained signatures.

Design (Structured Streaming, micro-batch):

* source: file stream of parquet drops with the transcripts schema
  (Iceberg/Kafka in production — same unbounded-DataFrame surface).
* watermark on ``ts`` bounds state: a conversation whose turns span
  longer than the watermark horizon is finalized from the last complete
  view (the batch pipeline re-derives exact signatures nightly; the
  stream keeps the candidate-facing table fresh).
* ``foreachBatch`` + groupBy(conv_id) per micro-batch, merged into the
  signatures store keyed by conv_id: turn lists from different batches
  are concatenated and re-sorted, so stable turn ordering (the per-row
  invariant) holds regardless of arrival order.
"""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def incremental_signatures(batch: DataFrame, store_path: str) -> None:
    """Merge one micro-batch of turns into the signature store.

    Store schema: (conv_id, turns array<struct<turn_idx,text,ts>>).
    Idempotent per (conv_id, turn_idx): re-delivered turns dedupe on the
    TURN KEY (not the full struct), so an at-least-once redelivery with a
    differing ts/text still yields one row per turn — the winner is the
    struct-min (turn_idx, text, ts), deterministic under any arrival
    order/partitioning."""
    spark = batch.sparkSession
    incoming = batch.groupBy("conv_id").agg(
        F.collect_list(F.struct("turn_idx", "text", "ts")).alias("turns")
    )
    store = Path(store_path)
    if store.exists():
        existing = spark.read.parquet(store_path)
        merged = (
            existing.unionByName(incoming)
            .select("conv_id", F.explode("turns").alias("t"))
            .groupBy("conv_id", F.col("t.turn_idx").alias("_turn_key"))
            .agg(F.min("t").alias("t"))
            .groupBy("conv_id")
            .agg(F.sort_array(F.collect_list("t")).alias("turns"))
        )
    else:
        merged = incoming.select(
            "conv_id", F.sort_array(F.col("turns")).alias("turns")
        )
    tmp = str(store) + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    final.write.mode("overwrite").parquet(store_path)


def signatures_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Render the store into the signatures relation (same columns as the
    batch stage, minus tokens which the batch scorer adds)."""
    store = spark.read.parquet(store_path)
    return store.select(
        "conv_id",
        F.array_join(F.col("turns.text"), " ").alias("sig_text"),
        F.size("turns").alias("n_turns"),
        F.array_min(F.col("turns.ts")).alias("first_ts"),
    )


def start_signature_stream(
    spark: SparkSession,
    source_path: str,
    store_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
):
    """Wire the stream; returns the StreamingQuery (caller awaits/stops)."""
    stream = read_transcript_stream(spark, source_path).withWatermark(
        "ts", watermark
    )
    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            lambda batch, _epoch: incremental_signatures(batch, store_path)
        )
        .trigger(availableNow=True)
        .start()
    )
