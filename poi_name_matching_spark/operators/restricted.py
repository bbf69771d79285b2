"""Restricted soft-TFIDF (K9): soft-TFIDF where each pair's corpus is
only the names appearing in pairs that share its left OR right name.

Reference: ``load_data/restricted_softtfidf.py:23-138``; the restricted
corpus is gathered at ``:27-46`` by re-scanning the whole pair table per
pair — O(n²·scan), the flagship anti-pattern (SURVEY.md §4.2). Here the
gather is the J3 join done ONCE set-at-a-time:

    left-share  = self-equi-join on left name
    right-share = self-equi-join on right name
    restricted corpus(pair) = collect_set over the union of both

then one pandas UDF computes the per-pair local df-map and the standard
soft-TFIDF formula (same kernel as ``kernels.restricted_soft_tfidf_pair``).

Scale: two shuffles (the two self-joins share the pair table's
partitioning) + one aggregation on the pair key. The per-pair corpus is
bounded by name-share degree, not corpus size — skewed hub names are the
risk; cap with ``max_corpus_names``.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions import kernels


def restricted_corpus(pairs: DataFrame, max_corpus_names: int = 1000) -> DataFrame:
    """pairs(left_name, right_name) → + restricted_names array<string>.

    The restricted corpus of a pair is every name (both sides) from pairs
    sharing its left_name OR its right_name (restricted_softtfidf.py:27-46).

    Aggregation state is BOUNDED before any array is built: the share
    sets are deduped as (key, name) ROWS (hash agg, constant per-row
    state), capped per key with a row_number window (spillable sort —
    a hub name shared by 10^7 pairs contributes at most
    ``max_corpus_names`` rows downstream), and only then collected. The
    former collect_list-then-slice built the full hub neighbor set in
    one aggregation buffer — multi-GB state on a hot key.
    """
    from pyspark.sql.window import Window

    base = pairs.select("left_name", "right_name").dropDuplicates()

    def _share(key_col: str, alias: str) -> DataFrame:
        kn = (
            base.select(
                F.col(key_col).alias("k"),
                F.explode(F.array("left_name", "right_name")).alias("name"),
            )
            .dropDuplicates(["k", "name"])  # hash agg: bounded state
        )
        ranked = kn.withColumn(
            "_rn", F.row_number().over(Window.partitionBy("k").orderBy("name"))
        ).filter(F.col("_rn") <= max_corpus_names)
        return ranked.groupBy("k").agg(F.collect_list("name").alias(alias))

    by_left = _share("left_name", "left_share")
    by_right = _share("right_name", "right_share")
    out = (
        base.join(by_left, base.left_name == by_left.k, "left")
        .drop("k")
        .join(by_right, base.right_name == by_right.k, "left")
        .drop("k")
        .withColumn(
            "restricted_names",
            F.slice(
                F.array_distinct(
                    F.concat(
                        F.coalesce("left_share", F.array()),
                        F.coalesce("right_share", F.array()),
                    )
                ),
                1,
                max_corpus_names,
            ),
        )
        .drop("left_share", "right_share")
    )
    return out


def make_restricted_softtfidf_udf(threshold: float = 0.95, tokenizer=None):
    """(left_name, right_name, restricted_names) -> score; jaro-winkler
    secondary at the repo's restricted operating config
    (``restricted_softtfidf.py:205``: thr 0.95 secondary, classify 0.25).
    ``tokenizer``: None → the canonical normalizer; the driver-contract
    query passes a lower+whitespace split for DuckDB reproducibility."""

    @pandas_udf(DoubleType())
    def restricted_udf(
        left: pd.Series, right: pd.Series, names: pd.Series
    ) -> pd.Series:
        jw = kernels.jaro_winkler_similarity
        kwargs = {} if tokenizer is None else {"tokenizer": tokenizer}
        out = []
        for l, r, ns in zip(left, right, names):
            corpus = list(ns) if ns is not None else []
            out.append(
                kernels.restricted_soft_tfidf_pair(
                    l or "", r or "", corpus, jw, threshold, **kwargs
                )
            )
        return pd.Series(out, dtype="float64")

    return restricted_udf


def score_restricted(
    pairs: DataFrame, secondary_threshold: float = 0.95, tokenizer=None
) -> DataFrame:
    """pairs(left_name, right_name, ...) → + restricted_softtfidf column."""
    with_corpus = restricted_corpus(pairs)
    udf = make_restricted_softtfidf_udf(secondary_threshold, tokenizer)
    scored = with_corpus.withColumn(
        "restricted_softtfidf",
        udf(F.col("left_name"), F.col("right_name"), F.col("restricted_names")),
    ).drop("restricted_names")
    return pairs.join(scored, ["left_name", "right_name"])
