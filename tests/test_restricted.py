"""Restricted soft-TFIDF: distributed J3 corpus gather == the reference's
per-pair rescan semantics (oracle: pure-python rescan)."""

import pytest

from poi_name_matching_spark.data import generate_labeled_pairs
from poi_name_matching_spark.functions import kernels
from poi_name_matching_spark.operators.restricted import score_restricted

N = 120
SEED = 9


@pytest.fixture(scope="module")
def pair_rows():
    rows = generate_labeled_pairs(N, SEED)
    seen, out = set(), []
    for r in rows:
        if (r[0], r[1]) in seen:
            continue
        seen.add((r[0], r[1]))
        out.append((r[0], r[1]))
    return out


def _python_restricted(pair_rows, left, right, thr=0.95):
    # reference semantics: scan all pairs; collect names of pairs sharing
    # left name OR right name (restricted_softtfidf.py:27-46)
    names = []
    for l, r in pair_rows:
        if l == left or r == right:
            names.extend([l, r])
    dedup = list(dict.fromkeys(names))
    return kernels.restricted_soft_tfidf_pair(
        left, right, dedup, kernels.jaro_winkler_similarity, thr
    )


def test_restricted_matches_reference_rescan(spark, pair_rows):
    df = spark.createDataFrame(pair_rows, "left_name string, right_name string")
    got = {
        (r["left_name"], r["right_name"]): r["restricted_softtfidf"]
        for r in score_restricted(df).collect()
    }
    for left, right in pair_rows[:40]:
        exp = _python_restricted(pair_rows, left, right)
        assert got[(left, right)] == pytest.approx(exp, abs=1e-9), (left, right)
