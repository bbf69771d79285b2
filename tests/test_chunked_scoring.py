"""Chunked (bounded-scratch-disk) scoring == unchunked scoring, exactly.

`score_pairs_chunked` exists because the scoring stage's wide
pairs×signatures exchange is the pipeline's dominant scratch-disk
consumer (~1 KB/pair of compressed shuffle — 64 GB measured at the
1 M-conversation endurance run), and chunking it is only admissible if
the output is BIT-identical: chunk membership is a pure function of the
pair and the df map is built once over the full corpus, so every score
is computed by the same arithmetic on the same inputs either way.
"""

import pyspark.sql.functions as F
import pytest

from poi_name_matching_spark.data import transcripts_df, truth_df
from poi_name_matching_spark.operators.blocking import (
    BlockingConfig,
    block_keys,
    candidate_pairs,
)
from poi_name_matching_spark.operators.scoring import (
    ScoringConfig,
    score_pairs,
    score_pairs_chunked,
)
from poi_name_matching_spark.operators.signatures import build_signatures
from poi_name_matching_spark.plans.pipeline import PipelineConfig, run_pipeline

N = 220
SEED = 33

# native + UDF + df-map kernel coverage without the slowest semantic path
KERNELS = ("levenshtein", "jaccard", "emb_cosine", "tfidf", "softtfidf")


@pytest.fixture(scope="module")
def scored_inputs(spark):
    tdf = transcripts_df(spark, n_convs=N, seed=SEED)
    sigs = build_signatures(tdf).cache()
    pairs = candidate_pairs(block_keys(sigs, BlockingConfig()), BlockingConfig())
    pairs = pairs.cache()
    pairs.count()
    return sigs, pairs


def _as_sorted_rows(df):
    return sorted(
        tuple(r) for r in df.select(sorted(df.columns)).collect()
    )


def test_chunked_equals_unchunked_exactly(spark, scored_inputs, tmp_path):
    sigs, pairs = scored_inputs
    cfg = ScoringConfig(kernels=KERNELS, score_kernel="tfidf")
    base = score_pairs(spark, pairs, sigs, cfg)
    chunked = score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=3, staging_dir=str(tmp_path / "staging")
    )
    assert chunked.columns == base.columns
    # bit-exact: same arithmetic on the same inputs per pair, so even the
    # float kernel columns must agree with NO tolerance
    assert _as_sorted_rows(chunked) == _as_sorted_rows(base)


def test_chunk_assignment_partitions_the_pairs(spark, scored_inputs, tmp_path):
    """Every pair lands in exactly one chunk (no dupes, no drops)."""
    sigs, pairs = scored_inputs
    cfg = ScoringConfig(kernels=("levenshtein",), score_kernel="levenshtein")
    chunked = score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=4, staging_dir=str(tmp_path / "staging")
    )
    n_pairs = pairs.count()
    assert chunked.count() == n_pairs
    assert (
        chunked.select("left_id", "right_id").distinct().count() == n_pairs
    )


def test_n_chunks_one_is_plain_score_pairs(spark, scored_inputs, tmp_path):
    sigs, pairs = scored_inputs
    cfg = ScoringConfig(kernels=("levenshtein",), score_kernel="levenshtein")
    out = score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=1, staging_dir=str(tmp_path / "staging")
    )
    assert out.count() == pairs.count()
    # no staging write happens on the single-chunk path
    assert not (tmp_path / "staging").exists()


def test_chunked_resume_skips_committed_chunks(spark, scored_inputs, tmp_path):
    """Crash-resume: with a matching resume_token, committed chunks are
    reused byte-for-byte; an uncommitted (no _SUCCESS) chunk — the crash
    window — is recomputed, and the result equals the fresh run."""
    import os

    sigs, pairs = scored_inputs
    cfg = ScoringConfig(kernels=("levenshtein", "tfidf"), score_kernel="tfidf")
    staging = str(tmp_path / "staging")
    base = score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=3, staging_dir=staging,
        resume_token="tok-a",
    )
    expected = _as_sorted_rows(base)

    # simulate a crash mid-chunk-2: drop its commit marker and corrupt a file
    c2 = os.path.join(staging, "chunk_2")
    os.remove(os.path.join(c2, "_SUCCESS"))
    part = next(p for p in os.listdir(c2) if p.endswith(".parquet"))
    with open(os.path.join(c2, part), "wb") as f:
        f.write(b"garbage")
    committed_files = {
        (d, p, os.path.getmtime(os.path.join(staging, d, p)))
        for d in ("chunk_0", "chunk_1")
        for p in os.listdir(os.path.join(staging, d))
    }

    resumed = score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=3, staging_dir=staging,
        resume_token="tok-a",
    )
    assert _as_sorted_rows(resumed) == expected
    # committed chunks were not rewritten (same files, same mtimes)
    assert committed_files == {
        (d, p, os.path.getmtime(os.path.join(staging, d, p)))
        for d in ("chunk_0", "chunk_1")
        for p in os.listdir(os.path.join(staging, d))
    }


def test_chunked_resume_rejects_stale_token(spark, scored_inputs, tmp_path):
    """A token mismatch (different inputs/config identity) or a chunk-count
    mismatch must start clean — never reuse another identity's chunks."""
    import os

    sigs, pairs = scored_inputs
    cfg = ScoringConfig(kernels=("levenshtein",), score_kernel="levenshtein")
    staging = str(tmp_path / "staging")
    score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=2, staging_dir=staging,
        resume_token="tok-a",
    ).count()
    mt0 = {
        p: os.path.getmtime(os.path.join(staging, "chunk_0", p))
        for p in os.listdir(os.path.join(staging, "chunk_0"))
    }
    out = score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=2, staging_dir=staging,
        resume_token="tok-B",
    )
    assert out.count() == pairs.count()
    mt1 = {
        p: os.path.getmtime(os.path.join(staging, "chunk_0", p))
        for p in os.listdir(os.path.join(staging, "chunk_0"))
    }
    # every file was rewritten under the new identity
    assert not (set(mt0.items()) & set(mt1.items()))
    # and n_chunks drift likewise rebuilds (meta pins both)
    out2 = score_pairs_chunked(
        spark, pairs, sigs, cfg, n_chunks=3, staging_dir=staging,
        resume_token="tok-B",
    )
    assert out2.count() == pairs.count()


def test_n_chunks_validation(spark, scored_inputs, tmp_path):
    sigs, pairs = scored_inputs
    with pytest.raises(ValueError, match="n_chunks"):
        score_pairs_chunked(
            spark,
            pairs,
            sigs,
            ScoringConfig(),
            n_chunks=0,
            staging_dir=str(tmp_path / "staging"),
        )


def test_pipeline_scoring_chunks_same_clusters_and_no_staging_residue(
    spark, tmp_path
):
    tdf = transcripts_df(spark, n_convs=N, seed=SEED)
    scoring = ScoringConfig(kernels=KERNELS, score_kernel="tfidf")
    plain = run_pipeline(
        spark,
        tdf,
        PipelineConfig(checkpoint_dir=tmp_path / "plain", scoring=scoring),
    )
    chunked = run_pipeline(
        spark,
        tdf,
        PipelineConfig(
            checkpoint_dir=tmp_path / "chunked",
            scoring=scoring,
            scoring_chunks=3,
        ),
    )
    assert _as_sorted_rows(chunked.scores) == _as_sorted_rows(plain.scores)
    assert _as_sorted_rows(chunked.components) == _as_sorted_rows(
        plain.components
    )
    # the staging copy is dropped once the stage store committed
    assert not (tmp_path / "chunked" / "_scores_staging").exists()
    # ...but the chunk loop's compute walls survive in the manifest:
    # write()'s own wall_ms starts AFTER compute() (the whole loop)
    # returned, so reporting that ignored these would inflate scoring
    # throughput by ~n_chunks× (observed 9,190 "pairs/s" vs a true ~320
    # on the 2k smoke before this annotation existed)
    from poi_name_matching_spark.sources.checkpoint import StageCheckpoint

    m = StageCheckpoint(tmp_path / "chunked").read_manifest("scores")
    assert set(m["chunk_walls_s"]) == {"0", "1", "2"}
    assert all(w >= 0 for w in m["chunk_walls_s"].values())
    assert m["scoring_loop_wall_ms"] == int(
        sum(m["chunk_walls_s"].values()) * 1000
    )
    # and the committed stage is a normal, resumable checkpoint
    resumed = run_pipeline(
        spark,
        tdf,
        PipelineConfig(
            checkpoint_dir=tmp_path / "chunked",
            scoring=scoring,
            scoring_chunks=3,
        ),
    )
    assert "scores" in resumed.cached_stages


def test_annotate_manifest_reporting_only(spark, tmp_path):
    """annotate_manifest merges reporting keys but refuses identity
    fields — a typo'd annotation must never be able to corrupt the
    resume contract (fingerprints, row counts)."""
    from poi_name_matching_spark.sources.checkpoint import StageCheckpoint

    ckpt = StageCheckpoint(tmp_path / "ck")
    df = spark.range(5).withColumnRenamed("id", "conv_id")
    ckpt.write("sigs", df, input_fingerprint="fp0")
    before = ckpt.read_manifest("sigs")

    ckpt.annotate_manifest("sigs", {"note_wall_ms": 123})
    after = ckpt.read_manifest("sigs")
    assert after["note_wall_ms"] == 123
    for k in ("input_fingerprint", "output_fingerprint", "rows"):
        assert after[k] == before[k]

    with pytest.raises(ValueError, match="cannot alter"):
        ckpt.annotate_manifest("sigs", {"rows": 0})
    with pytest.raises(FileNotFoundError):
        ckpt.annotate_manifest("nope", {"x": 1})
