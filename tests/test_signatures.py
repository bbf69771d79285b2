"""Signature stage: stable turn ordering is the per-row invariant
(BASELINE.json input_hint: per-turn text equality under stable turn
ordering, exercised against seeded-shuffled input rows)."""

from collections import defaultdict

from poi_name_matching_spark.data import generate_transcripts, transcripts_df
from poi_name_matching_spark.functions.tokenize import tokenize_name
from poi_name_matching_spark.operators.signatures import (
    build_signatures,
    turn_texts_ordered,
)

N = 120
SEED = 7


def _expected_sigs():
    res = generate_transcripts(n_convs=N, seed=SEED)
    turns = defaultdict(list)
    for conv_id, turn_idx, _role, text, _tool, _ts in res.rows:
        turns[conv_id].append((turn_idx, text))
    return {
        cid: " ".join(t for _, t in sorted(items)) for cid, items in turns.items()
    }


def test_sig_text_stable_order(spark):
    tdf = transcripts_df(spark, n_convs=N, seed=SEED)
    sigs = {
        r["conv_id"]: r["sig_text"]
        for r in build_signatures(tdf, with_tokens=False).collect()
    }
    expected = _expected_sigs()
    assert sigs == expected


def test_per_turn_text_equality(spark):
    """texts array must equal the reference ordering turn-by-turn."""
    res = generate_transcripts(n_convs=N, seed=SEED)
    by_conv = defaultdict(list)
    for conv_id, turn_idx, _role, text, _tool, _ts in res.rows:
        by_conv[conv_id].append((turn_idx, text))
    expected = {cid: [t for _, t in sorted(v)] for cid, v in by_conv.items()}

    tdf = transcripts_df(spark, n_convs=N, seed=SEED)
    got = {r["conv_id"]: list(r["texts"]) for r in turn_texts_ordered(tdf).collect()}
    assert got == expected


def test_tokens_match_canonical_tokenizer(spark):
    tdf = transcripts_df(spark, n_convs=N, seed=SEED)
    rows = build_signatures(tdf).collect()
    assert len(rows) == N
    for r in rows[:25]:
        assert list(r["tokens"]) == tokenize_name(r["sig_text"])


def test_n_turns_and_first_ts(spark):
    res = generate_transcripts(n_convs=N, seed=SEED)
    counts = defaultdict(int)
    first_ts = {}
    for conv_id, turn_idx, _role, _text, _tool, ts in res.rows:
        counts[conv_id] += 1
        if turn_idx == 0:
            first_ts[conv_id] = ts
    tdf = transcripts_df(spark, n_convs=N, seed=SEED)
    for r in build_signatures(tdf).collect():
        assert r["n_turns"] == counts[r["conv_id"]]
        assert r["first_ts"] == first_ts[r["conv_id"]]
