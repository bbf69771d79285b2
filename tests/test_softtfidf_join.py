"""Relational soft-TFIDF == python reference kernel, exactly, on real
candidate pairs (including the order-dependent argmax tie-break)."""

import pytest
from pyspark.sql import functions as F

from poi_name_matching_spark.data import transcripts_df
from poi_name_matching_spark.functions import kernels
from poi_name_matching_spark.operators.blocking import block_keys, candidate_pairs
from poi_name_matching_spark.operators.scoring import corpus_size, document_frequency
from poi_name_matching_spark.operators.signatures import build_signatures
from poi_name_matching_spark.operators.softtfidf_join import soft_tfidf_relational


@pytest.fixture(scope="module")
def fixture(spark):
    sigs = build_signatures(transcripts_df(spark, n_convs=150, seed=17)).cache()
    pairs = candidate_pairs(block_keys(sigs)).cache()
    dft = document_frequency(sigs).cache()
    return sigs, pairs, dft, corpus_size(sigs)


def test_relational_matches_python_kernel(spark, fixture):
    sigs, pairs, dft, cs = fixture
    rel = soft_tfidf_relational(spark, pairs, sigs, dft, cs, threshold=0.9)
    got = {(r["left_id"], r["right_id"]): r["softtfidf"] for r in rel.collect()}
    sig_map = {r["conv_id"]: list(r["tokens"]) for r in sigs.collect()}
    df_map = {r["token"]: r["df"] for r in dft.collect()}
    jw = kernels.jaro_winkler_similarity
    assert got, "no pairs scored"
    for (a, b), v in got.items():
        ta, tb = sig_map[a], sig_map[b]
        exp = (
            1.0 if ta == tb else kernels.soft_tfidf_pair(ta, tb, df_map, cs, jw, 0.9)
        )
        assert v == pytest.approx(exp, abs=1e-9), (a, b)


def test_relational_tie_break_earliest_y(spark):
    """Two y-terms with identical score (both equal to x-term after
    stemming is off here): earliest first-occurrence must win — pin the
    reference's strictly-improving-max order dependence."""
    sigs = spark.createDataFrame(
        [
            ("x", "a b", ["aaa", "bbb"]),
            ("y", "b a", ["zzz", "aaa", "aaa"]),
        ],
        "conv_id string, sig_text string, tokens array<string>",
    )
    pairs = spark.createDataFrame([("x", "y")], "left_id string, right_id string")
    dft = spark.createDataFrame(
        [("aaa", 1), ("bbb", 1), ("zzz", 2)], "token string, df long"
    )
    rel = soft_tfidf_relational(spark, pairs, sigs, dft, 2, threshold=0.9)
    got = rel.first()["softtfidf"]
    df_map = {"aaa": 1, "bbb": 1, "zzz": 2}
    exp = kernels.soft_tfidf_pair(
        ["aaa", "bbb"], ["zzz", "aaa", "aaa"], df_map, 2,
        kernels.jaro_winkler_similarity, 0.9,
    )
    assert got == pytest.approx(exp, abs=1e-12)


def test_relational_empty_and_exact(spark):
    sigs = spark.createDataFrame(
        [
            ("e1", "", []),
            ("e2", "", []),
            ("a1", "park pizza", ["park", "pizza"]),
            ("a2", "park pizza", ["park", "pizza"]),
        ],
        "conv_id string, sig_text string, tokens array<string>",
    )
    pairs = spark.createDataFrame(
        [("e1", "a1"), ("a1", "a2"), ("e1", "e2")],
        "left_id string, right_id string",
    )
    dft = spark.createDataFrame([("park", 1), ("pizza", 1)], "token string, df long")
    rel = soft_tfidf_relational(spark, pairs, sigs, dft, 2)
    got = {(r["left_id"], r["right_id"]): r["softtfidf"] for r in rel.collect()}
    assert got[("a1", "a2")] == 1.0   # exact token list
    assert got[("e1", "a1")] == 0.0   # one side empty
    assert got[("e1", "e2")] == 1.0   # both empty → token lists equal
