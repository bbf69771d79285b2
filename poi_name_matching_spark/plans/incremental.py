"""Incremental pipeline update: score only pairs touching NEW conversations.

At 10^11 conversations a daily batch re-run re-pays the scoring UDF for
every historical pair; the only work a day of arrivals actually creates
is (new × blocked-partners). This plan updates a completed pipeline
checkpoint (``plans/pipeline.py``) with a batch of new transcripts:

* heavy per-row work (signature build, MinHash keys, kernel scoring)
  runs ONLY on the new conversations / new-touching pairs;
* the full-corpus work that must be global stays cheap and narrow:
  the salt-size scan over the id-only block relation, the df-map
  aggregate over tokens, and the connected-components rounds over
  id-only edges;
* every updated stage checkpoint archives its previous version first
  (the snapshot mechanism in ``sources/checkpoint.py``), so an
  increment is rollback-able like an Iceberg table commit;
* stage commits are FAST APPENDS (``StageCheckpoint.append``): only
  the increment's rows are written as new files — O(increment) bytes
  per commit, never a rewrite of history. Only ``rescore_all`` (full
  df-map parity) and the components stage (cluster ids can change
  globally) rewrite whole stages.

Semantics vs a from-scratch batch run (documented, pinned by tests):

* **Pair set**: identical when no block crosses the salting cap.
  Salting is applied to the UNION block relation (so new pairs use the
  same sub-block boundaries a batch run would), but previously stored
  old×old pairs are kept as-is — if a new member re-salts a hot block,
  old×old pairs inside it are not re-derived. Differences are confined
  to capped hot blocks, whose recall contract is already carried by
  the MinHash band family (SCALE.md).
* **Scores**: new pairs are scored under the df-map of the UPDATED
  corpus; historical pair scores are retained as written (df drift is
  bounded by the increment/corpus ratio — the standard freshness
  trade). ``rescore_all=True`` re-scores every pair under the current
  df-map instead, giving bit-identical parity with a batch run at the
  cost of a full scoring pass.
* Conversations whose conv_id already exists in the checkpoint are
  dropped (at-least-once redelivery safety), counted in
  ``stats["n_redelivered_dropped"]``.

``stats["phase_wall_s"]`` records wall seconds per phase (signatures,
blocking, scoring, commit, components, retention) — the per-stage
metrics the north rule asks each checkpoint commit to carry, and the
first thing to read when an increment is slower than expected.
"""

from __future__ import annotations

import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.blocking import block_keys, salt_oversized
from ..operators.clustering import components, incremental_components
from ..operators.scoring import edges_from_scores, score_pairs
from ..operators.signatures import build_signatures
from ..sources.checkpoint import StageCheckpoint, stage_fingerprint
from .pipeline import PipelineConfig, PipelineResult


def incremental_update(
    spark: SparkSession,
    new_transcripts: DataFrame,
    cfg: PipelineConfig = PipelineConfig(),
    rescore_all: bool = False,
    expire_keep_last: int | None = 3,
) -> PipelineResult:
    """Merge a batch of new conversations into a completed pipeline
    checkpoint and refresh clusters. Requires every stage of a prior
    ``run_pipeline`` at ``cfg.checkpoint_dir``.

    ``expire_keep_last``: snapshot retention — after the commit, keep at
    most this many archived versions per stage. Fast-append archives
    (the default path) are tiny (manifest + file listing — the appended
    data files stay live), but full-rewrite archives (``rescore_all``,
    and the components stage every increment) are corpus-sized copies,
    so unbounded retention would grow the checkpoint dir by O(corpus)
    per increment. ``None`` keeps everything."""
    if cfg.shuffle_partitions:
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(cfg.shuffle_partitions)
        )
    ckpt = StageCheckpoint(cfg.checkpoint_dir)
    for stage in (
        "signatures", "blocks", "candidate_pairs", "scores", "components"
    ):
        if ckpt.read_manifest(stage) is None:
            raise FileNotFoundError(
                f"incremental_update needs a completed pipeline checkpoint; "
                f"stage {stage!r} is missing at {cfg.checkpoint_dir} — run "
                "run_pipeline first"
            )
    stats: dict = {}
    phases: dict[str, float] = {}
    stats["phase_wall_s"] = phases
    _t0 = time.monotonic()

    def _mark(phase: str) -> None:
        nonlocal _t0
        now = time.monotonic()
        phases[phase] = round(phases.get(phase, 0.0) + (now - _t0), 2)
        _t0 = now

    from ..operators.scoring import udf_stage_parallelism

    old_sigs = ckpt.load(spark, "signatures")
    old_blocks = ckpt.load(spark, "blocks")
    old_pairs = ckpt.load(spark, "candidate_pairs")
    old_scores = ckpt.load(spark, "scores")
    # captured BEFORE the scores commit replaces the manifest: decides
    # whether the historical edge set is reusable for incremental CC
    old_scores_meta = ckpt.read_manifest("scores")

    # ---- signatures: UDF work on NEW conversations only ----------------
    in_fp = stage_fingerprint(new_transcripts)
    with udf_stage_parallelism(spark):
        incoming = build_signatures(new_transcripts)
        # at-least-once redelivery: already-known conversations are frozen
        new_sigs = incoming.join(
            old_sigs.select("conv_id"), "conv_id", "left_anti"
        ).persist()
        n_new = new_sigs.count()
    stats["n_new_convs"] = n_new
    # redelivery count WITHOUT re-running the signature UDF: distinct
    # conv ids in the raw increment minus the survivors
    stats["n_redelivered_dropped"] = (
        new_transcripts.select("conv_id").distinct().count() - n_new
    )
    _mark("signatures")

    all_sigs = old_sigs.unionByName(new_sigs)

    # ---- blocking: keys for new convs; salting over the UNION ----------
    with udf_stage_parallelism(spark):
        # persisted: materialized once (as part of the union scan below)
        # then reused by the fast-append commit of the blocks stage
        new_blocks = block_keys(new_sigs, cfg.blocking).persist()
    blocks_all = old_blocks.unionByName(new_blocks)
    # the stored blocks stage stays UNSALTED (as in the batch pipeline —
    # salting is a pair-generation concern); salt a join-local view so
    # sub-block boundaries match what a batch run over the union would
    # use, without baking '#salt' suffixes into the next increment's input
    join_blocks = blocks_all
    blocks_cached = None
    if cfg.blocking.max_block_size:
        # the size scan runs over the id-only union relation (narrow,
        # cheap); keep the persisted handle so it can be released below
        blocks_cached = blocks_all.persist()
        join_blocks = salt_oversized(blocks_cached, cfg.blocking.max_block_size)
    new_ids = new_sigs.select("conv_id")
    new_side = join_blocks.join(new_ids, "conv_id")
    touched_keys = new_side.select("block_key").distinct()
    # members of touched blocks only — untouched old blocks are never
    # joined (the whole point: per-increment join work is O(new × cap))
    touched = join_blocks.join(touched_keys, "block_key")
    cand = (
        new_side.select(F.col("conv_id").alias("a"), "block_key")
        .join(
            touched.select(F.col("conv_id").alias("b"), "block_key"),
            "block_key",
        )
        .filter(F.col("a") != F.col("b"))
        .select(
            F.least("a", "b").alias("left_id"),
            F.greatest("a", "b").alias("right_id"),
        )
        .dropDuplicates(["left_id", "right_id"])
    )
    new_pairs = cand.join(
        old_pairs, ["left_id", "right_id"], "left_anti"
    ).persist()
    # this count MATERIALIZES the MinHash-UDF blocking work — it must run
    # under the advisory guard (the config is read at execution time;
    # plan construction above is not enough — see udf_stage_parallelism)
    with udf_stage_parallelism(spark):
        stats["n_new_pairs"] = new_pairs.count()
    pairs_all = old_pairs.unionByName(new_pairs)
    _mark("blocking")

    # ---- scoring + commit ----------------------------------------------
    import shutil

    staging = Path(str(ckpt.root)) / "_incr_staging"
    score_extra = {
        "score_kernel": cfg.scoring.score_kernel,
        "threshold": cfg.scoring.threshold,
        "rescore_all": bool(rescore_all),
    }
    if rescore_all:
        # full-rewrite path: every pair is rescored under the updated
        # df-map, so every stage is a full overwrite. Stage the unions
        # to scratch BEFORE touching the checkpoint: the union plans
        # still READ the current stage files, and ckpt.write archives
        # (renames) those files before writing — a direct write would
        # pull its own input out from under itself.
        with udf_stage_parallelism(spark):
            scores_all = score_pairs(spark, pairs_all, all_sigs, cfg.scoring)
            shutil.rmtree(staging, ignore_errors=True)

            def _stage(name: str, df: DataFrame) -> DataFrame:
                p = str(staging / name)
                df.write.parquet(p)
                _mark(f"stage_{name}")
                return spark.read.parquet(p)

            all_sigs = _stage("signatures", all_sigs)
            blocks_all = _stage("blocks", blocks_all)
            pairs_all = _stage("candidate_pairs", pairs_all)
            # the scores staging write is where the scoring kernels (and
            # the df-map build over the updated corpus) actually EXECUTE
            scores_all = _stage("scores", scores_all)

            sigs = ckpt.write(
                "signatures",
                all_sigs,
                input_fingerprint=f"incr:{in_fp}",
                bucket_by="conv_id" if cfg.bucket_signatures else None,
                n_buckets=cfg.bucket_signatures or 32,
            )
            _mark("commit_signatures")
            blocks = ckpt.write(
                "blocks", blocks_all, input_fingerprint=f"incr:{in_fp}"
            )
            _mark("commit_blocks")
        pairs = ckpt.write(
            "candidate_pairs", pairs_all, input_fingerprint=f"incr:{in_fp}"
        )
        _mark("commit_candidate_pairs")
        scores = ckpt.write(
            "scores",
            scores_all,
            input_fingerprint=f"incr:{in_fp}",
            extra=score_extra,
        )
        _mark("commit_scores")
    else:
        # fast-append path (the default, and the 100 TB shape): each
        # stage commits ONLY the increment's rows as new files —
        # O(increment) bytes written per commit, history untouched,
        # rollback-able (ckpt.append archives manifest + file listing).
        #
        # COMMIT ORDER IS LOAD-BEARING (leaf-first): every parquet/table
        # append fires Spark's refreshByPath / table-cache invalidation,
        # which RE-COMPILES any cached DataFrame whose lineage reads the
        # mutated stage — the persisted new_sigs/new_blocks/new_pairs
        # would silently re-evaluate against the already-appended stage
        # (the redelivery anti-join then yields EMPTY increments). So
        # each stage is committed strictly before any stage its
        # increment's lineage reads is mutated:
        #   scores          (reads signatures + new_pairs)   first,
        #   candidate_pairs (reads blocks/pairs/signatures)  second,
        #   blocks          (reads signatures via new_sigs)  third,
        #   signatures      (reads the signatures stage)     last.
        with udf_stage_parallelism(spark):
            new_scores = score_pairs(spark, new_pairs, all_sigs, cfg.scoring)
            scores = ckpt.append(
                "scores",
                new_scores,
                input_fingerprint=f"incr:{in_fp}",
                extra=score_extra,
                expect_rows=stats["n_new_pairs"],
            )
            _mark("commit_scores")
        pairs = ckpt.append(
            "candidate_pairs",
            new_pairs,
            input_fingerprint=f"incr:{in_fp}",
            expect_rows=stats["n_new_pairs"],
        )
        _mark("commit_candidate_pairs")
        with udf_stage_parallelism(spark):
            n_new_blocks = new_blocks.count()  # cached; cheap
            blocks = ckpt.append(
                "blocks",
                new_blocks,
                input_fingerprint=f"incr:{in_fp}",
                expect_rows=n_new_blocks,
            )
            _mark("commit_blocks")
            sigs = ckpt.append(
                "signatures",
                new_sigs,
                input_fingerprint=f"incr:{in_fp}",
                expect_rows=n_new,
            )
            _mark("commit_signatures")

    # ---- clustering -----------------------------------------------------
    # Default path: CONTRACTION — old components become supernodes and
    # CC runs only over the increment's edges (O(increment), identical
    # output to a full run because old edges are unchanged and labels
    # are min-composable; see operators/clustering.py). Inputs come
    # from the appended FILES (not the persisted increment plans, whose
    # caches the appends above may have invalidated-and-recompiled
    # against the mutated stages) plus the not-yet-touched components
    # stage. Falls back to full CC when the historical edge set is not
    # reusable: rescore_all, or a changed threshold/kernel.
    same_operating_point = (
        old_scores_meta is not None
        and old_scores_meta.get("threshold") == cfg.scoring.threshold
        and old_scores_meta.get("score_kernel") == cfg.scoring.score_kernel
    )
    if rescore_all or not same_operating_point:
        stats["components_mode"] = "full"
        comps_df = components(
            sigs.select("conv_id"),
            edges_from_scores(scores, cfg.scoring.threshold),
        )
    else:
        stats["components_mode"] = "incremental"
        old_comps = ckpt.load(spark, "components")
        comps_df = incremental_components(
            old_comps,
            ckpt.load_appended(spark, "signatures").select("conv_id"),
            edges_from_scores(
                ckpt.load_appended(spark, "scores"), cfg.scoring.threshold
            ),
        # materialize BEFORE ckpt.write archives (renames) the current
        # components files this plan reads — same self-read hazard as
        # the rescore staging
        ).localCheckpoint(eager=True)
    comps = ckpt.write(
        "components", comps_df, input_fingerprint=f"incr:{in_fp}"
    )
    _mark("components")
    new_sigs.unpersist()
    new_blocks.unpersist()
    new_pairs.unpersist()
    if blocks_cached is not None:
        blocks_cached.unpersist()
    shutil.rmtree(staging, ignore_errors=True)
    if expire_keep_last is not None:
        for stage in (
            "signatures", "blocks", "candidate_pairs", "scores", "components"
        ):
            ckpt.expire_snapshots(stage, keep_last=expire_keep_last)
    _mark("retention")

    stats["n_signatures"] = ckpt.read_manifest("signatures")["rows"]
    stats["n_candidate_pairs"] = ckpt.read_manifest("candidate_pairs")["rows"]
    stats["n_components"] = (
        comps.select("component_id").distinct().count()
    )
    return PipelineResult(sigs, pairs, scores, comps, [], stats)
