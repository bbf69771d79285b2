"""Relational soft-TFIDF: the term-match loop as joins + aggregates.

The pandas-UDF scorer runs the reference's O(|x|·|y|) per-pair term loop
in Python (``kernels.soft_tfidf_pair``). This operator re-expresses the
same semantics JVM-side so only *distinct term pairs* ever reach Python:

    x_terms(pair, tx, tfx)        posexplode + groupBy
    y_terms(pair, ty, tfy, pos)   (pos = first occurrence, for tie-break)
    term_pairs = DISTINCT (tx, ty) across all candidates   ← the dedup win
    scored_tp  = jw(term_pairs) >= threshold               ← one small UDF
    winner(pair, tx) = max_by(struct(score, -pos))         ← reference's
        strictly-improving max: highest score, earliest y-position tie-break
    numerator / denominators: joins with the df table + one aggregate

Exact-parity notes (vs ``test_hybrid_func.py:53-131``):
* winner = argmax score with ties to the EARLIEST term_y in tf_y
  insertion order — the reference's ``score > max`` never replaces an
  equal score, and Counter insertion order is first-occurrence order;
* terms absent from the df map contribute nothing to numerator or
  denominator (inner join with df), but a *winner* term_y missing from
  the df map gets idf = corpus_size/1 (the reference's ``.get(ty, 1)``);
* exact-token-list pairs → 1.0, either-empty → 0.0, zero denominator →
  raw numerator (reference returns ``result`` unnormalized).

Scale: popular term pairs are scored once globally instead of once per
candidate pair (dedup factor = candidate multiplicity); the heavy
intermediate (x⋈y on pair_id) is id+short-string rows, shuffled once.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from ..functions import kernels


def _jw_pairs_udf():
    @pandas_udf(DoubleType())
    def jw_udf(a: pd.Series, b: pd.Series) -> pd.Series:
        f = kernels.jaro_winkler_similarity
        return pd.Series([f(x, y) for x, y in zip(a, b)], dtype="float64")

    return jw_udf


def soft_tfidf_relational(
    spark: SparkSession,
    pairs: DataFrame,
    signatures: DataFrame,
    df_table: DataFrame,
    corpus_size: int,
    threshold: float = 0.9,
) -> DataFrame:
    """scores(left_id, right_id, softtfidf) for candidate ``pairs``
    against ``signatures(conv_id, tokens)``; ``df_table(token, df)`` is
    the corpus document-frequency relation (NOT collected)."""
    sig = signatures.select("conv_id", "tokens")
    l = sig.select(F.col("conv_id").alias("left_id"), F.col("tokens").alias("lt"))
    r = sig.select(F.col("conv_id").alias("right_id"), F.col("tokens").alias("rt"))
    base = (
        pairs.select("left_id", "right_id")
        .join(l, "left_id")
        .join(r, "right_id")
        .withColumn("pair_id", F.xxhash64("left_id", "right_id"))
    )

    exact = base.filter(F.col("lt") == F.col("rt")).select(
        "left_id", "right_id", F.lit(1.0).alias("softtfidf")
    )
    empty = base.filter(
        (F.col("lt") != F.col("rt"))
        & ((F.size("lt") == 0) | (F.size("rt") == 0))
    ).select("left_id", "right_id", F.lit(0.0).alias("softtfidf"))
    live = base.filter(
        (F.col("lt") != F.col("rt")) & (F.size("lt") > 0) & (F.size("rt") > 0)
    ).cache()

    xt = (
        live.select("pair_id", F.explode("lt").alias("tx"))
        .groupBy("pair_id", "tx")
        .agg(F.count("*").alias("tfx"))
    )
    yt = (
        live.select("pair_id", F.posexplode("rt").alias("pos", "ty"))
        .groupBy("pair_id", "ty")
        .agg(F.count("*").alias("tfy"), F.min("pos").alias("pos"))
    )

    cand = xt.join(yt, "pair_id")
    term_pairs = cand.select("tx", "ty").distinct()
    jw = _jw_pairs_udf()
    scored_tp = (
        term_pairs.withColumn("score", jw(F.col("tx"), F.col("ty")))
        .filter(F.col("score") >= F.lit(float(threshold)))
    )

    # winner per (pair, tx): highest score, earliest y first-occurrence
    matched = cand.join(scored_tp, ["tx", "ty"])
    winner = matched.groupBy("pair_id", "tx", "tfx").agg(
        F.max(
            F.struct(
                F.col("score"),
                (-F.col("pos")).alias("neg_pos"),
                F.col("ty"),
                F.col("tfy"),
            )
        ).alias("w")
    )

    dfx = df_table.select(F.col("token").alias("tx"), F.col("df").alias("dfx"))
    dfy = df_table.select(F.col("token").alias("ty"), F.col("df").alias("dfy"))
    cs = F.lit(float(corpus_size))

    # numerator: term_x must exist in the df map (inner join); the winner
    # term_y falls back to df=1 when absent (reference .get(ty, 1))
    num = (
        winner.join(dfx, "tx")  # inner: no-df terms contribute nothing
        .join(dfy, F.col("w.ty") == dfy["ty"], "left")
        .select(
            "pair_id",
            (
                (cs / F.col("dfx"))
                * F.col("tfx")
                * (cs / F.coalesce(F.col("dfy"), F.lit(1)))
                * F.col("w.tfy")
                * F.col("w.score")
            ).alias("contrib"),
        )
        .groupBy("pair_id")
        .agg(F.sum("contrib").alias("numerator"))
    )

    # denominators over the UNION of terms with df present
    union_terms = (
        xt.select("pair_id", F.col("tx").alias("token"), F.col("tfx").alias("tf_x"))
        .join(
            yt.select(
                "pair_id", F.col("ty").alias("token"), F.col("tfy").alias("tf_y")
            ),
            ["pair_id", "token"],
            "full",
        )
        .fillna(0, subset=["tf_x", "tf_y"])
    )
    den = (
        union_terms.join(
            df_table.select("token", "df"), "token"
        )  # inner: skip no-df terms
        .select(
            "pair_id",
            ((cs / F.col("df")) * F.col("tf_x")).alias("vx"),
            ((cs / F.col("df")) * F.col("tf_y")).alias("vy"),
        )
        .groupBy("pair_id")
        .agg(
            F.sum(F.col("vx") * F.col("vx")).alias("den_x"),
            F.sum(F.col("vy") * F.col("vy")).alias("den_y"),
        )
    )

    assembled = (
        live.select("left_id", "right_id", "pair_id")
        .join(num, "pair_id", "left")
        .join(den, "pair_id", "left")
        .select(
            "left_id",
            "right_id",
            F.when(
                (F.coalesce(F.col("den_x"), F.lit(0.0)) == 0)
                | (F.coalesce(F.col("den_y"), F.lit(0.0)) == 0),
                F.coalesce(F.col("numerator"), F.lit(0.0)),
            )
            .otherwise(
                F.coalesce(F.col("numerator"), F.lit(0.0))
                / (F.sqrt(F.col("den_x")) * F.sqrt(F.col("den_y")))
            )
            .alias("softtfidf"),
        )
    )
    return exact.unionByName(empty).unionByName(assembled)
