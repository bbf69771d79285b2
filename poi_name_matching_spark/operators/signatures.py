"""Signature stage: transcripts → per-conversation canonical entity signature.

The reference's unit of matching is a POI *name* string (``load_data/
load_osm.py:70``). Our unit is a conversation: its "name" is the
concatenation of its turn texts **in stable turn order** — the per-row
invariant from BASELINE.json ``input_hint`` ("per-turn text equality under
stable turn ordering").

Spark-first design notes (100 TB scale):

* One hash aggregation on ``conv_id`` — the only shuffle in the stage.
  ``sort_array(collect_list(struct(turn_idx, …)))`` gives deterministic
  turn order regardless of input row order or partitioning; no window
  function (a window would add a sort per partition for no benefit).
* Turn texts and metadata are carried through the single ``collect_list``
  (one struct per turn) instead of one aggregation per column.
* ``normalize_tokens`` (the canonical tokenizer F2-F4, reference
  ``load_data/tokenizer.py:24-50``) runs ONCE per conversation here, not
  once per candidate pair later — the same precompute-once optimization
  the reference applies to its document-frequency map.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spark_udfs import normalize_tokens

SIGNATURE_COLS = ["conv_id", "sig_text", "tokens", "n_turns", "first_ts"]


def build_signatures(transcripts: DataFrame, with_tokens: bool = True) -> DataFrame:
    """signatures(conv_id, sig_text, tokens, n_turns, first_ts).

    ``sig_text`` = turn texts joined with a single space, ordered by
    ``turn_idx`` (ties impossible: turn_idx is unique per conv). A NULL
    turn text joins as the empty string (explicit ``nullReplacement``):
    the default ``array_join`` silently DROPS nulls, which would give a
    conversation with turns ['a', NULL, 'b'] the same sig_text as one
    with ['a', 'b'] — treating per-turn-different conversations as exact
    duplicates while n_turns still counted the null turn. With the
    replacement, the null turn keeps its position (double separator), so
    sig_text stays consistent with n_turns and the per-turn-equality
    invariant.
    """
    turns = F.sort_array(
        F.collect_list(F.struct(F.col("turn_idx"), F.col("text"), F.col("ts")))
    )
    sig = (
        transcripts.groupBy("conv_id")
        .agg(turns.alias("turns"))
        .select(
            "conv_id",
            F.array_join(F.col("turns.text"), " ", "").alias("sig_text"),
            F.size("turns").alias("n_turns"),
            F.array_min(F.col("turns.ts")).alias("first_ts"),
        )
    )
    if with_tokens:
        sig = sig.withColumn("tokens", normalize_tokens(F.col("sig_text")))
        sig = sig.select("conv_id", "sig_text", "tokens", "n_turns", "first_ts")
    return sig


def turn_texts_ordered(transcripts: DataFrame) -> DataFrame:
    """(conv_id, texts array<string>) in stable turn order — used by the
    per-turn-equality invariant test."""
    return (
        transcripts.groupBy("conv_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("turn_idx", "text"))
            ).alias("turns")
        )
        .select("conv_id", F.col("turns.text").alias("texts"))
    )
