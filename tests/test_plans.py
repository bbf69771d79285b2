"""Physical-plan regression tests: pushdown, pruning, and join strategy
must not rot silently — these are the properties that decide whether the
same query is cheap or catastrophic at 100 TB."""

import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def _formatted(df) -> str:
    return df._jdf.queryExecution().explainString(
        df._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )


def test_bbox_filter_pushes_to_scan(spark):
    from poi_name_matching_spark.queries import p5_bbox_filter

    plan = _formatted(p5_bbox_filter(spark, SF))
    assert "PushedFilters" in plan
    # all four range predicates reach the parquet reader
    for frag in [
        "LessThan(l_quantity", "GreaterThan(l_quantity",
        "GreaterThan(l_discount", "LessThan(l_discount",
    ]:
        assert frag in plan, frag


def test_projection_prunes_scan_schema(spark):
    from poi_name_matching_spark.queries import p2_filter_eq

    plan = _formatted(p2_filter_eq(spark, SF))
    # ReadSchema carries only the selected + filtered columns
    read = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    for col in ("event_id", "user_id", "value", "event_type"):
        assert col in read
    assert "payload" not in read and "ts" not in read


def test_dimension_join_broadcasts(spark):
    from poi_name_matching_spark.queries import j4_tag_lookup_join

    plan = _formatted(j4_tag_lookup_join(spark, SF))
    assert "BroadcastHashJoin" in plan


def test_scoring_join_partitions_by_right_id(spark):
    """The shipped scoring plan must sort-merge the right_id join (co-
    location contract of the winner caches) — a silent downgrade to
    broadcast would break cache-hit scaling."""
    from poi_name_matching_spark.data import transcripts_df
    from poi_name_matching_spark.operators.blocking import block_keys, candidate_pairs
    from poi_name_matching_spark.operators.scoring import ScoringConfig, score_pairs
    from poi_name_matching_spark.operators.signatures import build_signatures

    sigs = build_signatures(transcripts_df(spark, n_convs=60, seed=4))
    pairs = candidate_pairs(block_keys(sigs))
    scores = score_pairs(
        spark, pairs, sigs, ScoringConfig(kernels=("levenshtein", "tfidf"))
    )
    plan = _formatted(scores)
    assert "SortMergeJoin" in plan
