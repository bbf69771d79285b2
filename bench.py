#!/usr/bin/env python
"""Benchmark harness.

Default: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric", "value", "unit": "sec", "queries": {...}, "sf", ...}
with extra keys pairs_per_sec / n_candidate_pairs for the north metric
(candidate-pairs-scored/sec).

--scaling: runs the same ER scoring job at local[8] and local[32] on the
same input and reports throughput at both plus scaling efficiency
= (T_8 / T_32) / 4  (the in-sandbox stand-in for the N-vs-4N-executor
criterion; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time


def _mk_spark(cpus: str, app: str):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(max(int(cpus) * 2, 8)))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )


def _force(df) -> int:
    """Materialize fully; return row count (one pass, no driver collect)."""
    return df.count()


def _er_inputs(spark, n_convs: int, seed: int = 42):
    from poi_name_matching_spark.data import transcripts_df

    return transcripts_df(spark, n_convs=n_convs, seed=seed).cache()


def _er_pipeline(spark, transcripts, threshold=0.425):
    """signatures → blocking → scoring (north-rule suite) → components.
    Returns (n_pairs, components_df)."""
    from poi_name_matching_spark.operators.blocking import block_keys, candidate_pairs
    from poi_name_matching_spark.operators.clustering import components
    from poi_name_matching_spark.operators.scoring import (
        ScoringConfig,
        edges_from_scores,
        score_pairs,
    )
    from poi_name_matching_spark.operators.signatures import build_signatures

    sigs = build_signatures(transcripts)
    pairs = candidate_pairs(block_keys(sigs))
    cfg = ScoringConfig(
        kernels=("levenshtein", "jaccard", "jaro_winkler", "emb_cosine", "tfidf"),
        score_kernel="tfidf",
        threshold=threshold,
    )
    # cache: the components stage consumes scores; without it the whole
    # scoring chain re-executes inside the first CC round (the pipeline
    # driver avoids this via stage checkpoints)
    scores = score_pairs(spark, pairs, sigs, cfg).cache()
    comps = components(sigs.select("conv_id"), edges_from_scores(scores, threshold))
    return scores, comps


def run_bench() -> dict:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else 0.0
    n_convs = max(int(40000 * sf), 500)

    spark = _mk_spark(cpus, "poi-bench")
    from pyspark.sql import functions as F

    from poi_name_matching_spark.operators import ann, dedup
    from poi_name_matching_spark.queries import (
        a1_group_count,
        a3_document_frequency,
        j1_grid_band_join,
    )

    queries: dict[str, float] = {}
    extra: dict = {"sf": sf, "cpus": int(cpus), "n_convs": n_convs}

    t0 = time.monotonic()

    # -- headline: ER pipeline over planted-duplicate transcripts --------
    transcripts = _er_inputs(spark, n_convs)
    transcripts.count()  # materialize cache outside the timed region
    t = time.monotonic()
    scores, comps = _er_pipeline(spark, transcripts)
    n_pairs = _force(scores)
    queries["er_score_pairs"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    n_comp = _force(comps)
    queries["er_components"] = round(time.monotonic() - t, 3)
    extra["n_candidate_pairs"] = n_pairs
    extra["n_components"] = n_comp
    extra["pairs_per_sec"] = round(n_pairs / queries["er_score_pairs"], 1)

    # -- relational / training-data operators over testdata --------------
    for name, fn in [
        ("a1_group_count", lambda: a1_group_count(spark, sf_dir)),
        ("j1_grid_band_join", lambda: j1_grid_band_join(spark, sf_dir)),
        ("a3_document_frequency", lambda: a3_document_frequency(spark, sf_dir)),
    ]:
        t = time.monotonic()
        _force(fn())
        queries[name] = round(time.monotonic() - t, 3)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    t = time.monotonic()
    _force(dedup.exact_dedup(docs))
    queries["dedup_exact"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    _force(dedup.minhash_lsh_pairs(docs, threshold=0.5))
    queries["dedup_minhash_lsh"] = round(time.monotonic() - t, 3)
    t = time.monotonic()
    _force(dedup.simhash_pairs(docs, max_hamming=3))
    queries["dedup_simhash"] = round(time.monotonic() - t, 3)

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    t = time.monotonic()
    _force(ann.brute_force_topk(emb, q, k=10))
    queries["ann_brute_topk"] = round(time.monotonic() - t, 3)

    total = round(time.monotonic() - t0, 3)
    spark.stop()
    return {
        "metric": "bench_total",
        "value": total,
        "unit": "sec",
        "queries": queries,
        **extra,
    }


def run_scaling() -> dict:
    """Same ER scoring job, same input, local[8] vs local[32]."""
    results = {}
    n_convs = int(os.environ.get("SCALING_N_CONVS", "4000"))
    for cpus in ("8", "32"):
        spark = _mk_spark(cpus, f"poi-scaling-{cpus}")
        transcripts = _er_inputs(spark, n_convs)
        transcripts.count()
        t = time.monotonic()
        scores, _ = _er_pipeline(spark, transcripts)
        n_pairs = _force(scores)
        wall = time.monotonic() - t
        results[cpus] = {
            "wall_sec": round(wall, 3),
            "n_pairs": n_pairs,
            "pairs_per_sec": round(n_pairs / wall, 1),
        }
        spark.stop()
    eff = (results["8"]["wall_sec"] / results["32"]["wall_sec"]) / 4.0
    return {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "results": results,
        "n_convs": n_convs,
    }


if __name__ == "__main__":
    out = run_scaling() if "--scaling" in sys.argv else run_bench()
    print(json.dumps(out))
