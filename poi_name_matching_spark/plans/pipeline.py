"""The flagship plan: transcripts → signatures → blocks → candidate pairs
→ scores → edges → components, each stage checkpointed with a manifest.

This is the distributed re-creation of the reference's three entry points
chained together (``label_data.py`` candidate generation →
``ml_similarity_metrics.py`` feature build → threshold classification of
``baseline.py``), plus the transitive-clustering stage the north rule
adds.

Resumability: every stage is keyed by the fingerprint of its input stage
PLUS the config it is built under (blocking config for blocks/pairs,
scoring config minus threshold for scores, threshold for components);
rerunning after a crash (or after deleting one stage directory) recomputes
exactly that stage and its downstream, never upstream (FIXTURES.md §6),
and rerunning with a changed config recomputes exactly the stages that
config reaches — a threshold retune reuses scores and recomputes only
the clustering.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.blocking import BlockingConfig, block_keys, block_stats, candidate_pairs
from ..operators.clustering import components
from ..operators.scoring import (
    ScoringConfig,
    edges_from_scores,
    score_pairs,
    score_pairs_chunked,
)
from ..operators.signatures import build_signatures
from ..sources.checkpoint import StageCheckpoint, stage_fingerprint

STAGES = ["signatures", "blocks", "candidate_pairs", "scores", "components"]

#: WAL marker an incremental_update leaves while its multi-stage commit
#: is in flight (see plans/incremental.py). A COMPLETED batch run
#: supersedes any pending increment — run_pipeline clears a stale
#: marker on success so the prescribed recovery remediation ("re-run
#: run_pipeline") cannot leave a marker that would make the next
#: incremental_update roll the fresh rebuild back to pre-crash
#: snapshots.
PENDING_MARKER_NAME = "_incr_pending.json"


def _output_fp(ckpt: StageCheckpoint, stage: str, df: DataFrame) -> str:
    """Output fingerprint of a completed stage: fast path reads the
    manifest (recorded at write time in the same scan as partition
    stats); fallback recomputes only for pre-upgrade checkpoints whose
    manifest lacks the field."""
    manifest = ckpt.read_manifest(stage) or {}
    return manifest.get("output_fingerprint") or stage_fingerprint(df)


@dataclass
class PipelineConfig:
    checkpoint_dir: str | Path = "out"
    blocking: BlockingConfig = field(default_factory=BlockingConfig)
    scoring: ScoringConfig = field(default_factory=ScoringConfig)
    shuffle_partitions: int | None = None  # None → session default
    #: bucket the signatures checkpoint by conv_id into this many
    #: buckets: the scoring stage's two signature joins then read the
    #: hash partitioning from table metadata and skip the signatures-
    #: side Exchange (only the id-only pair relation shuffles). None →
    #: plain parquet. Size to the scoring shuffle parallelism.
    bucket_signatures: int | None = None
    #: snapshot retention for BATCH runs: after a completed run, keep at
    #: most this many archived versions per stage. Every stage overwrite
    #: archives a corpus-sized full snapshot (rename, no copy) — without
    #: retention, daily rebuilds grow the checkpoint dir by O(corpus)
    #: per run forever. ``None`` keeps everything (scratch/debug).
    expire_keep_last: int | None = 3
    #: small-file maintenance for the INCREMENTAL path: after each
    #: committed increment, any stage whose data-file count exceeds this
    #: is compacted (``StageCheckpoint.compact`` — content- and
    #: fingerprint-preserving rewrite, Iceberg rewrite_data_files
    #: analog). Fast appends write O(increment) files per commit; at
    #: 100 TB a year of daily increments is ~10^5 files per stage and
    #: per-file open cost dominates every scan. ``None`` disables
    #: (compact manually / out-of-band).
    compact_above_files: int | None = None
    #: scratch-disk bound for the scoring stage: >1 scores the candidate
    #: pairs in this many hash-chunks (``scoring.score_pairs_chunked``),
    #: each its own job appending to a staging dir under the checkpoint,
    #: so the stage's wide pairs×signatures shuffle (~1 KB/pair — the
    #: measured 64 GB at 65 M pairs that exhausts a single scratch
    #: volume first) peaks at 1/chunks of the unchunked run. Output is
    #: bit-identical (chunking is pair-pure; the df map is built once
    #: over the full corpus), so this is NOT part of the scores cache
    #: identity. 1 → plain single-job scoring.
    scoring_chunks: int = 1


@dataclass
class PipelineResult:
    signatures: DataFrame
    candidate_pairs: DataFrame
    scores: DataFrame
    components: DataFrame
    cached_stages: list[str]
    stats: dict


def run_pipeline(
    spark: SparkSession, transcripts: DataFrame, cfg: PipelineConfig = PipelineConfig()
) -> PipelineResult:
    if cfg.shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(cfg.shuffle_partitions))
    ckpt = StageCheckpoint(cfg.checkpoint_dir)
    cached: list[str] = []
    stats: dict = {}

    from dataclasses import asdict
    import json as _json

    from ..operators.scoring import udf_stage_parallelism

    in_fp = stage_fingerprint(transcripts)
    # config is part of each stage's cache identity: a resume keyed on
    # data fingerprints alone would cache-HIT a stage built under a
    # different config — e.g. a threshold retune would silently return
    # the OLD components, and the blocking-drift refusal's prescribed
    # remediation ("rebuild via run_pipeline with the new config") would
    # no-op on cached config-A blocks. threshold is excluded from the
    # scores identity on purpose: scores are threshold-independent, so a
    # retune reuses them and recomputes only edges → components.
    blocking_key = _json.dumps(asdict(cfg.blocking), sort_keys=True)
    scoring_d = asdict(cfg.scoring)
    scoring_d.pop("threshold")
    scoring_key = _json.dumps(scoring_d, sort_keys=True)

    # signatures and blocks are UDF-heavy too (stemmer / MinHash): keep
    # AQE from byte-coalescing their post-shuffle partitions down to a
    # handful — the groupBy(conv_id) output is small in BYTES but each
    # row costs a stemmer pass (see scoring.udf_stage_parallelism)
    with udf_stage_parallelism(spark):
        sigs, hit = ckpt.get_or_compute(
            spark,
            "signatures",
            lambda: build_signatures(transcripts),
            in_fp,
            bucket_by="conv_id" if cfg.bucket_signatures else None,
            n_buckets=cfg.bucket_signatures or 32,
        )
    if hit:
        cached.append("signatures")
    sig_fp = _output_fp(ckpt, "signatures", sigs)

    def _blocks():
        b = block_keys(sigs, cfg.blocking)
        return b

    with udf_stage_parallelism(spark):
        # the blocking config is part of the blocks stage's identity
        # (cache key AND manifest record): incremental_update compares
        # the record so a drifted config (different key families / cap)
        # cannot silently shrink the pair universe
        blocks, hit = ckpt.get_or_compute(
            spark,
            "blocks",
            _blocks,
            f"{sig_fp}|cfg:{blocking_key}",
            extra={"blocking_config": asdict(cfg.blocking)},
        )
    if hit:
        cached.append("blocks")
    blocks_fp = _output_fp(ckpt, "blocks", blocks)
    stats["max_block_size"] = (
        block_stats(blocks).agg(F.max("block_size")).first()[0]
    )

    pairs, hit = ckpt.get_or_compute(
        spark,
        "candidate_pairs",
        # blocks is checkpoint-backed parquet here: re-scanning it for
        # salting's three references is cheap AND recomputable, so skip
        # the extra materialization copy (see candidate_pairs docstring)
        lambda: candidate_pairs(blocks, cfg.blocking, materialize="none"),
        f"{blocks_fp}|cfg:{blocking_key}",
    )
    if hit:
        cached.append("candidate_pairs")
    pairs_fp = _output_fp(ckpt, "candidate_pairs", pairs)

    # UDF-heavy stage: keep AQE from byte-coalescing the scoring
    # partitions down to core count (stragglers — see
    # scoring.udf_stage_parallelism)
    scores_staging = str(Path(cfg.checkpoint_dir) / "_scores_staging")

    def _scores():
        if cfg.scoring_chunks > 1:
            return score_pairs_chunked(
                spark,
                pairs,
                sigs,
                cfg.scoring,
                cfg.scoring_chunks,
                scores_staging,
                # the scores cache key doubles as the staging resume
                # token: same pairs fingerprint + same scoring config →
                # committed chunks are reusable after a crashed run
                resume_token=f"{pairs_fp}|cfg:{scoring_key}",
            )
        return score_pairs(spark, pairs, sigs, cfg.scoring)

    with udf_stage_parallelism(spark):
        scores, hit = ckpt.get_or_compute(
            spark,
            "scores",
            _scores,
            f"{pairs_fp}|cfg:{scoring_key}",
            # scoring_config (threshold-independent, JSON-normalized) is
            # the record incremental_update's drift guard compares: any
            # drifted scoring parameter — not just the kernel — would
            # append incomparable values into the existing scores column
            extra={
                "score_kernel": cfg.scoring.score_kernel,
                "threshold": cfg.scoring.threshold,
                "scoring_config": _json.loads(scoring_key),
            },
        )
    if hit:
        cached.append("scores")
    else:
        # chunked scoring's staging copy is superseded by the stage
        # store's committed write (`write` returns the reloaded store
        # df, not the staging read) — drop it so the checkpoint dir
        # doesn't carry a second scores-sized copy. First salvage the
        # per-chunk compute walls the loop recorded there: the stage
        # manifest's wall_ms times only the promote step (write()'s
        # clock starts after the chunk loop returned), so without this
        # annotation the scoring stage's real cost vanishes with the
        # staging dir and any throughput derived from wall_ms is
        # inflated by ~n_chunks× the true figure.
        import shutil as _shutil

        if cfg.scoring_chunks > 1:
            try:
                with open(Path(scores_staging) / "_staging_meta.json") as _f:
                    _walls = _json.load(_f).get("chunk_walls_s") or {}
            except (OSError, ValueError):
                _walls = {}
            if _walls:
                ckpt.annotate_manifest(
                    "scores",
                    {
                        "chunk_walls_s": _walls,
                        "scoring_loop_wall_ms": int(
                            sum(_walls.values()) * 1000
                        ),
                    },
                )
        _shutil.rmtree(scores_staging, ignore_errors=True)
    scores_fp = _output_fp(ckpt, "scores", scores)

    def _components():
        edges = edges_from_scores(scores, cfg.scoring.threshold)
        return components(sigs.select("conv_id"), edges)

    comps, hit = ckpt.get_or_compute(
        spark,
        "components",
        _components,
        f"{scores_fp}|threshold:{cfg.scoring.threshold}",
        # explicit linkage for incremental CC's staleness guard (the
        # input fingerprint now carries the threshold suffix, so the
        # guard's raw-fingerprint fallback would no longer match).
        # threshold is recorded HERE — on the stage it actually shaped —
        # because the scores manifest's threshold goes stale on a retune
        # (scores cache-hit keeps the old extras while components
        # rebuild at the new threshold); the operating-point guard must
        # compare against what the stored clusters were built at
        extra={
            "scores_fingerprint": scores_fp,
            "threshold": cfg.scoring.threshold,
        },
    )
    if hit:
        cached.append("components")

    stats["n_signatures"] = ckpt.read_manifest("signatures")["rows"]
    stats["n_candidate_pairs"] = ckpt.read_manifest("candidate_pairs")["rows"]
    stats["n_components"] = comps.select("component_id").distinct().count()
    # a completed batch run supersedes any in-flight increment: clear a
    # stale WAL marker so it cannot trigger a bogus rollback of this
    # rebuild at the next incremental_update
    (Path(cfg.checkpoint_dir) / PENDING_MARKER_NAME).unlink(missing_ok=True)
    if cfg.expire_keep_last is not None:
        for stage in STAGES:
            ckpt.expire_snapshots(stage, keep_last=cfg.expire_keep_last)
    return PipelineResult(sigs, pairs, scores, comps, cached, stats)
