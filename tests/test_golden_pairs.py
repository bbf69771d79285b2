"""Golden-decision gate (north rule): pairwise F1 >= 0.99 agreement
between the distributed scoring path and an independent driver-side
evaluation of the reference formulas, on the labeled-pairs fixture at the
repo's operating points (BASELINE.md)."""

import pytest
from pyspark.sql import functions as F

from poi_name_matching_spark.data import generate_labeled_pairs, labeled_pairs_df
from poi_name_matching_spark.functions import kernels
from poi_name_matching_spark.functions.tokenize import tokenize_name
from poi_name_matching_spark.operators.evaluation import (
    drop_unusable_labels,
    evaluate,
    metrics_from_counts,
)
from poi_name_matching_spark.operators.scoring import (
    ScoringConfig,
    broadcast_df_map,
    score_pairs,
)

N = 1200
SEED = 42


@pytest.fixture(scope="module")
def scored(spark):
    """Score the labeled pairs through the DISTRIBUTED path: build a
    signatures-shaped frame from the distinct names, pair table from the
    fixture, full suite scoring."""
    pairs_raw = labeled_pairs_df(spark, n_pairs=N, seed=SEED)
    pairs_raw = drop_unusable_labels(pairs_raw)  # baseline.py:124-125
    names = (
        pairs_raw.select(F.col("left_name").alias("sig_text"))
        .union(pairs_raw.select("right_name"))
        .distinct()
    )
    from poi_name_matching_spark.functions.spark_udfs import normalize_tokens

    sigs = names.select(
        F.col("sig_text").alias("conv_id"),  # names double as ids here
        "sig_text",
        normalize_tokens(F.col("sig_text")).alias("tokens"),
    )
    pair_ids = pairs_raw.select(
        F.col("left_name").alias("left_id"),
        F.col("right_name").alias("right_id"),
        "match",
    ).dropDuplicates(["left_id", "right_id"])
    cfg = ScoringConfig()
    scores = score_pairs(spark, pair_ids, sigs, cfg)
    return pair_ids.join(scores, ["left_id", "right_id"]).cache()


def _python_scores():
    """Independent driver-side scoring with the reference formulas."""
    rows = generate_labeled_pairs(N, SEED)
    rows = [r for r in rows if r[7] in (0, 1)]
    seen = set()
    pairs = []
    for r in rows:
        key = (r[0], r[1])
        if key in seen:
            continue
        seen.add(key)
        pairs.append((r[0], r[1], r[7]))
    names = sorted({p[0] for p in pairs} | {p[1] for p in pairs})
    toks = {n: tokenize_name(n) for n in names}
    df_map = kernels.build_document_frequency([toks[n] for n in names])
    cs = len(names)
    jw = kernels.jaro_winkler_similarity
    out = []
    for left, right, match in pairs:
        lt, rt = toks[left], toks[right]
        if lt == rt:
            soft = tfidf = 1.0
        else:
            soft = kernels.soft_tfidf_pair(lt, rt, df_map, cs, jw, 0.9)
            tfidf = kernels.tfidf_pair(lt, rt, df_map, cs)
        out.append((left, right, match, soft, tfidf))
    return out


def test_pairwise_f1_vs_reference_decisions(spark, scored):
    """F1 of agreement between distributed decisions and independent
    reference-formula decisions at soft-TFIDF @ 0.4
    (semantic_soft_tfidf.py:324) must be >= 0.99."""
    py = _python_scores()
    py_dec = {(l, r): int(s >= 0.4) for l, r, _m, s, _t in py}
    rows = scored.select("left_id", "right_id", "softtfidf").collect()
    tp = fp = fn = tn = 0
    for r in rows:
        ours = int(r["softtfidf"] >= 0.4)
        ref = py_dec[(r["left_id"], r["right_id"])]
        if ours and ref:
            tp += 1
        elif ours and not ref:
            fp += 1
        elif not ours and ref:
            fn += 1
        else:
            tn += 1
    m = metrics_from_counts(tp, fp, fn, tn)
    assert m.f1 >= 0.99, m


def test_operating_point_quality_on_planted_labels(spark, scored):
    """Match quality against the PLANTED labels at the operating point —
    the fixture analog of the reference's F1 0.976 @ softtfidf 0.4."""
    m = evaluate(
        scored.withColumn("score", F.col("softtfidf")), threshold=0.4
    )
    assert m.f1 >= 0.95, m
    assert m.precision >= 0.95 and m.recall >= 0.9, m


def test_exact_name_pairs_score_one(spark, scored):
    """Auto-label rule analog (label_data.py:75-76): exact-name pairs
    (the generator's 'exact' noise kind, ~60% of matches) must score 1.0
    on every kernel via the short-circuit."""
    exact = scored.filter(F.col("left_id") == F.col("right_id"))
    n = exact.count()
    assert n > 0
    bad = exact.filter(
        (F.col("softtfidf") != 1.0)
        | (F.col("tfidf") != 1.0)
        | (F.col("levenshtein") != 1.0)
        | (F.col("jaccard") != 1.0)
    ).count()
    assert bad == 0
