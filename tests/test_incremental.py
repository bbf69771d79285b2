"""Incremental pipeline update vs a from-scratch batch run: identical
pair universe, bit-identical scores under rescore_all, snapshot-archived
stage history, redelivery safety."""

import pytest
from pyspark.sql import functions as F

from poi_name_matching_spark.data import generate_transcripts
from poi_name_matching_spark.data.transcripts import TRANSCRIPTS_SCHEMA
from poi_name_matching_spark.plans.incremental import incremental_update
from poi_name_matching_spark.plans.pipeline import PipelineConfig, run_pipeline
from poi_name_matching_spark.sources.checkpoint import StageCheckpoint

N = 120


def _cfg(path):
    return PipelineConfig(checkpoint_dir=str(path))


@pytest.fixture(scope="module")
def split(spark):
    res = generate_transcripts(n_convs=N, seed=21)
    full = spark.createDataFrame(res.rows, TRANSCRIPTS_SCHEMA)
    convs = sorted({r[0] for r in res.rows})
    old_ids = set(convs[: int(N * 0.75)])
    part1 = full.filter(F.col("conv_id").isin(old_ids))
    part2 = full.filter(~F.col("conv_id").isin(old_ids))
    return full, part1, part2


def _pairs(df):
    return {(r["left_id"], r["right_id"]) for r in df.collect()}


def _clusters(comps):
    from collections import defaultdict

    groups = defaultdict(set)
    for r in comps.collect():
        groups[r["component_id"]].add(r["conv_id"])
    return {frozenset(v) for v in groups.values()}


class TestIncrementalUpdate:
    def test_matches_batch_run(self, spark, tmp_path, split):
        full, part1, part2 = split
        inc_dir, batch_dir = tmp_path / "inc", tmp_path / "batch"
        run_pipeline(spark, part1, _cfg(inc_dir))
        inc = incremental_update(spark, part2, _cfg(inc_dir), rescore_all=True)
        batch = run_pipeline(spark, full, _cfg(batch_dir))

        # identical candidate-pair universe (no oversized blocks here)
        assert _pairs(inc.candidate_pairs) == _pairs(batch.candidate_pairs)
        # bit-identical scores under rescore_all (same df-map)
        inc_scores = {
            (r["left_id"], r["right_id"]): r["score"]
            for r in inc.scores.collect()
        }
        for r in batch.scores.collect():
            assert inc_scores[(r["left_id"], r["right_id"])] == r["score"]
        # identical clusters
        assert _clusters(inc.components) == _clusters(batch.components)
        assert inc.stats["n_new_convs"] == N - int(N * 0.75)
        assert inc.stats["n_redelivered_dropped"] == 0

    def test_default_mode_scores_new_pairs_and_keeps_old(
        self, spark, tmp_path, split
    ):
        full, part1, part2 = split
        d = tmp_path / "inc2"
        base = run_pipeline(spark, part1, _cfg(d))
        old_scores = {
            (r["left_id"], r["right_id"]): r["score"]
            for r in base.scores.collect()
        }
        inc = incremental_update(spark, part2, _cfg(d))
        got = {
            (r["left_id"], r["right_id"]): r["score"]
            for r in inc.scores.collect()
        }
        # historical pairs: retained exactly as written (no rescore)
        for k, v in old_scores.items():
            assert got[k] == v
        # every pair involving a new conversation is present and scored
        new_ids = {r[0] for r in part2.select("conv_id").distinct().collect()}
        assert inc.stats["n_new_pairs"] == sum(
            1 for (l, r) in got if l in new_ids or r in new_ids
        )
        # the previous stage versions were archived, not destroyed
        ck = StageCheckpoint(d)
        for stage in ("signatures", "scores", "components"):
            assert ck.snapshot_versions(stage), stage
        hist = ck.history("signatures")
        assert hist[0]["rows"] == int(N * 0.75) and hist[-1]["rows"] == N

    def test_redelivered_conversations_dropped(self, spark, tmp_path, split):
        full, part1, part2 = split
        d = tmp_path / "inc3"
        run_pipeline(spark, part1, _cfg(d))
        # redeliver a slice of part1 along with part2
        redelivered = part1.limit(0).unionByName(part2).unionByName(
            part1.join(
                part1.select("conv_id").distinct().limit(5), "conv_id"
            )
        )
        inc = incremental_update(spark, redelivered, _cfg(d))
        assert inc.stats["n_redelivered_dropped"] == 5
        assert inc.stats["n_signatures"] == N

    def test_requires_completed_checkpoint(self, spark, tmp_path, split):
        _, _, part2 = split
        with pytest.raises(FileNotFoundError, match="signatures"):
            incremental_update(spark, part2, _cfg(tmp_path / "missing"))


class TestIncrementalFastAppend:
    def test_default_mode_never_rewrites_history(self, spark, tmp_path, split):
        """The default increment is a fast-append commit: every data
        file that existed before the increment is byte-identical after
        it (same inode/mtime/size) for all four appended stages — the
        O(increment)-bytes-per-commit contract at 10^12 turns. Only the
        components stage (global cluster ids) is rewritten."""
        import os

        full, part1, part2 = split
        d = tmp_path / "incfa"
        run_pipeline(spark, part1, _cfg(d))
        ck = StageCheckpoint(d)
        stages = ("signatures", "blocks", "candidate_pairs", "scores")
        before = {
            s: {
                f: os.stat(ck._dir(s) / "data.parquet" / f)
                for f in ck._data_files(s)
            }
            for s in stages
        }
        inc = incremental_update(spark, part2, _cfg(d))
        for s in stages:
            data_dir = ck._dir(s) / "data.parquet"
            now_files = set(ck._data_files(s))
            assert set(before[s]) < now_files, s  # files were added
            for f, st in before[s].items():
                now = os.stat(data_dir / f)
                assert (st.st_mtime_ns, st.st_size, st.st_ino) == (
                    now.st_mtime_ns, now.st_size, now.st_ino
                ), f"stage {s} rewrote pre-increment file {f}"
            # the append manifest composes to exactly the full content
            m = ck.read_manifest(s)
            from poi_name_matching_spark.sources.checkpoint import (
                stage_fingerprint,
            )

            assert m["output_fingerprint"] == stage_fingerprint(
                ck.load(spark, s)
            ), s
        # increment is rollback-able: scores roll back to the base run
        base_rows = before["scores"]
        ck.rollback("scores", ck.snapshot_versions("scores")[-1])
        assert set(ck._data_files("scores")) == set(base_rows)

    def test_default_mode_appends_real_increments_bucketed(
        self, spark, tmp_path, split
    ):
        """Regression for the append-order cache-invalidation bug: under
        a BUCKETED signatures stage (file listing re-resolves per
        action), appending signatures before blocks/pairs silently
        re-evaluated the persisted increments to EMPTY (the redelivery
        anti-join saw the already-appended rows). Pin that every stage's
        content matches a from-scratch batch run's universe in default
        mode."""
        full, part1, part2 = split

        def cfg(path):
            return PipelineConfig(
                checkpoint_dir=str(path), bucket_signatures=8
            )

        d = tmp_path / "incfb"
        run_pipeline(spark, part1, cfg(d))
        inc = incremental_update(spark, part2, cfg(d))
        batch = run_pipeline(spark, full, cfg(tmp_path / "batchb"))
        # identical signature ids, block relation size, pair universe
        assert {r["conv_id"] for r in inc.signatures.collect()} == {
            r["conv_id"] for r in batch.signatures.collect()
        }
        ck = StageCheckpoint(d)
        bk = StageCheckpoint(tmp_path / "batchb")
        assert (
            ck.read_manifest("blocks")["rows"]
            == bk.read_manifest("blocks")["rows"]
        )
        assert _pairs(inc.candidate_pairs) == _pairs(batch.candidate_pairs)
        # scores stage covers exactly the pair universe
        assert ck.read_manifest("scores")["rows"] == len(
            _pairs(batch.candidate_pairs)
        )
        assert _clusters(inc.components) == _clusters(batch.components)


def test_changed_threshold_falls_back_to_full_components(
    spark, tmp_path, split
):
    """Contraction reuses the historical edge set; moving the operating
    point (threshold) invalidates it, so the increment must re-run full
    CC (and record which mode ran)."""
    from poi_name_matching_spark.operators.scoring import ScoringConfig

    full, part1, part2 = split
    d = tmp_path / "incth"
    run_pipeline(spark, part1, _cfg(d))
    base_thresh = PipelineConfig().scoring.threshold
    moved = PipelineConfig(
        checkpoint_dir=str(d),
        scoring=ScoringConfig(threshold=base_thresh + 0.07),
    )
    inc = incremental_update(spark, part2, moved)
    assert inc.stats["components_mode"] == "full"
    # and the unchanged operating point uses contraction
    d2 = tmp_path / "incth2"
    run_pipeline(spark, part1, _cfg(d2))
    inc2 = incremental_update(spark, part2, _cfg(d2))
    assert inc2.stats["components_mode"] == "incremental"


def test_fully_redelivered_batch_is_a_noop_commit(spark, tmp_path, split):
    """An increment consisting only of already-known conversations must
    commit zero rows to every stage (at-least-once redelivery safety on
    the fast-append path) and leave stage contents fingerprint-stable."""
    full, part1, part2 = split
    d = tmp_path / "incnoop"
    run_pipeline(spark, part1, _cfg(d))
    ck = StageCheckpoint(d)
    before = {
        s: ck.read_manifest(s)["output_fingerprint"]
        for s in ("signatures", "blocks", "candidate_pairs", "scores")
    }
    inc = incremental_update(spark, part1, _cfg(d))  # all redelivered
    assert inc.stats["n_new_convs"] == 0
    assert inc.stats["n_new_pairs"] == 0
    assert inc.stats["n_redelivered_dropped"] == int(N * 0.75)
    for s, fp in before.items():
        m = ck.read_manifest(s)
        assert m["output_fingerprint"] == fp, s
        assert m["appended"]["rows"] == 0, s
    # clusters unchanged
    assert inc.stats["components_mode"] == "incremental"


class TestCrashRecovery:
    """A crash anywhere in the multi-stage commit sequence must leave no
    trace once the batch is redelivered: the WAL marker
    (``_incr_pending.json``) plus snapshot rollback make each increment
    exactly-once. These pin the two crash windows the leaf-first commit
    order opened: a partially-committed increment double-applying on
    redelivery, and an increment whose components write never ran
    stranding conversations outside the clusters."""

    def test_crash_after_scores_append_no_duplicate_scores(
        self, spark, tmp_path, split, monkeypatch
    ):
        full, part1, part2 = split
        d, clean = tmp_path / "c1", tmp_path / "c1clean"
        run_pipeline(spark, part1, _cfg(d))
        run_pipeline(spark, part1, _cfg(clean))
        orig = StageCheckpoint.append

        def crashing(self, stage, *a, **k):
            out = orig(self, stage, *a, **k)
            if stage == "scores":
                raise RuntimeError("simulated crash after scores commit")
            return out

        monkeypatch.setattr(StageCheckpoint, "append", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            incremental_update(spark, part2, _cfg(d))
        monkeypatch.setattr(StageCheckpoint, "append", orig)
        assert (d / "_incr_pending.json").exists()

        inc = incremental_update(spark, part2, _cfg(d))
        assert not (d / "_incr_pending.json").exists()
        assert inc.stats["recovered_rollback"]["rolled_back"] == ["scores"]
        # exactly one score row per pair — the crashed append was rolled
        # back, not double-applied on redelivery
        dupes = (
            inc.scores.groupBy("left_id", "right_id")
            .count()
            .filter(F.col("count") > 1)
            .count()
        )
        assert dupes == 0
        # bit-identical to a never-crashed increment, stage by stage
        ref = incremental_update(spark, part2, _cfg(clean))
        ck, ck_ref = StageCheckpoint(d), StageCheckpoint(clean)
        for s in ("signatures", "blocks", "candidate_pairs", "scores",
                  "components"):
            assert (
                ck.read_manifest(s)["output_fingerprint"]
                == ck_ref.read_manifest(s)["output_fingerprint"]
            ), s
        assert _clusters(inc.components) == _clusters(ref.components)

    def test_crash_before_components_write_strands_no_convs(
        self, spark, tmp_path, split, monkeypatch
    ):
        full, part1, part2 = split
        d = tmp_path / "c2"
        run_pipeline(spark, part1, _cfg(d))
        orig = StageCheckpoint.write

        def crashing(self, stage, *a, **k):
            if stage == "components":
                raise RuntimeError("simulated crash before components")
            return orig(self, stage, *a, **k)

        monkeypatch.setattr(StageCheckpoint, "write", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            incremental_update(spark, part2, _cfg(d))
        monkeypatch.setattr(StageCheckpoint, "write", orig)

        # all four data stages carried the increment; recovery rolls them
        # all back and the redelivered batch re-applies in full
        inc = incremental_update(spark, part2, _cfg(d))
        assert set(inc.stats["recovered_rollback"]["rolled_back"]) == {
            "signatures", "blocks", "candidate_pairs", "scores"
        }
        assert inc.stats["n_new_convs"] == N - int(N * 0.75)
        # every conversation is clustered — none stranded outside
        comp_ids = {r["conv_id"] for r in inc.components.collect()}
        all_ids = {r["conv_id"] for r in full.select("conv_id").distinct().collect()}
        assert comp_ids == all_ids

    def test_crashed_redelivery_of_applied_batch_rolls_nothing_back(
        self, spark, tmp_path, split, monkeypatch
    ):
        """Fingerprint-matched recovery: a crashed RE-delivery of an
        already-applied batch commits only zero-row appends, whose
        fingerprints are unchanged — recovery must leave those stages
        alone rather than roll them back past the successful first
        application."""
        full, part1, part2 = split
        d = tmp_path / "c3"
        run_pipeline(spark, part1, _cfg(d))
        incremental_update(spark, part2, _cfg(d))  # applied cleanly
        ck = StageCheckpoint(d)
        before = {
            s: ck.read_manifest(s)["output_fingerprint"]
            for s in ("signatures", "blocks", "candidate_pairs", "scores")
        }
        orig = StageCheckpoint.append

        def crashing(self, stage, *a, **k):
            out = orig(self, stage, *a, **k)
            if stage == "scores":
                raise RuntimeError("simulated crash on redelivery")
            return out

        monkeypatch.setattr(StageCheckpoint, "append", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            incremental_update(spark, part2, _cfg(d))
        monkeypatch.setattr(StageCheckpoint, "append", orig)

        inc = incremental_update(spark, part2, _cfg(d))
        assert inc.stats["recovered_rollback"]["rolled_back"] == []
        assert inc.stats["n_new_convs"] == 0
        for s, fp in before.items():
            assert ck.read_manifest(s)["output_fingerprint"] == fp, s

    def test_broken_components_linkage_self_heals_with_full_cc(
        self, spark, tmp_path, split
    ):
        """If the components stage does not reflect the pre-append scores
        state (manual surgery, older-format checkpoint), the contraction
        path would silently drop conversations — the linkage guard must
        fall back to one full CC instead."""
        import json

        full, part1, part2 = split
        d = tmp_path / "c4"
        run_pipeline(spark, part1, _cfg(d))
        ck = StageCheckpoint(d)
        m = ck.read_manifest("components")
        m["input_fingerprint"] = "bogus-stale-linkage"
        # batch runs now record the explicit linkage key too — an
        # older-format / hand-edited checkpoint has neither intact
        m.pop("scores_fingerprint", None)
        ck.manifest_path("components").write_text(json.dumps(m))

        inc = incremental_update(spark, part2, _cfg(d))
        assert inc.stats["components_mode"] == "full"
        assert (
            inc.stats["components_full_reason"]
            == "components_scores_linkage_broken"
        )
        comp_ids = {r["conv_id"] for r in inc.components.collect()}
        all_ids = {r["conv_id"] for r in full.select("conv_id").distinct().collect()}
        assert comp_ids == all_ids
        # the repaired commit re-records the linkage: next increment can
        # go incremental again
        m2 = ck.read_manifest("components")
        assert m2["scores_fingerprint"] == ck.read_manifest("scores")[
            "output_fingerprint"
        ]

    def test_crash_mid_rescore_all_recovers_full_snapshots(
        self, spark, tmp_path, split, monkeypatch
    ):
        """The rescore_all path commits FULL rewrites (archived as full
        snapshots); a crash mid-sequence must recover through the
        full-snapshot rollback branch and leave the redelivered rescore
        bit-identical to a never-crashed one."""
        full, part1, part2 = split
        d, clean = tmp_path / "c5", tmp_path / "c5clean"
        run_pipeline(spark, part1, _cfg(d))
        run_pipeline(spark, part1, _cfg(clean))
        orig = StageCheckpoint.write

        def crashing(self, stage, *a, **k):
            if stage == "scores":
                raise RuntimeError("simulated crash before scores rewrite")
            return orig(self, stage, *a, **k)

        monkeypatch.setattr(StageCheckpoint, "write", crashing)
        with pytest.raises(RuntimeError, match="simulated crash"):
            incremental_update(spark, part2, _cfg(d), rescore_all=True)
        monkeypatch.setattr(StageCheckpoint, "write", orig)

        inc = incremental_update(spark, part2, _cfg(d), rescore_all=True)
        assert set(inc.stats["recovered_rollback"]["rolled_back"]) == {
            "signatures", "blocks", "candidate_pairs"
        }
        ref = incremental_update(spark, part2, _cfg(clean), rescore_all=True)
        ck, ck_ref = StageCheckpoint(d), StageCheckpoint(clean)
        for s in ("signatures", "blocks", "candidate_pairs", "scores",
                  "components"):
            assert (
                ck.read_manifest(s)["output_fingerprint"]
                == ck_ref.read_manifest(s)["output_fingerprint"]
            ), s
        assert _clusters(inc.components) == _clusters(ref.components)


class TestConfigDriftGuards:
    """incremental_update must REFUSE config drift before any mutation:
    mixed-kernel score columns and shrunken pair universes are silent
    corruption a manifest rewrite would then hide forever."""

    def test_kernel_change_without_rescore_raises(self, spark, tmp_path, split):
        from poi_name_matching_spark.operators.scoring import ScoringConfig

        _, part1, part2 = split
        d = tmp_path / "g1"
        run_pipeline(spark, part1, _cfg(d))
        drifted = PipelineConfig(
            checkpoint_dir=str(d),
            scoring=ScoringConfig(score_kernel="jaro_winkler"),
        )
        before = StageCheckpoint(d).read_manifest("scores")
        with pytest.raises(ValueError, match="score_kernel"):
            incremental_update(spark, part2, drifted)
        # nothing was mutated by the refused call
        after = StageCheckpoint(d).read_manifest("scores")
        assert after == before
        # rescore_all makes the kernel change legal (full rescore)
        inc = incremental_update(spark, part2, drifted, rescore_all=True)
        m = StageCheckpoint(d).read_manifest("scores")
        assert m["score_kernel"] == "jaro_winkler"
        assert inc.stats["components_mode"] == "full"

    def test_blocking_config_drift_raises(self, spark, tmp_path, split):
        from poi_name_matching_spark.operators.blocking import BlockingConfig

        _, part1, part2 = split
        d = tmp_path / "g2"
        run_pipeline(spark, part1, _cfg(d))
        drifted = PipelineConfig(
            checkpoint_dir=str(d),
            blocking=BlockingConfig(use_second_token=True),
        )
        with pytest.raises(ValueError, match="blocking config"):
            incremental_update(spark, part2, drifted)
        # the stored config is recorded by the batch run
        m = StageCheckpoint(d).read_manifest("blocks")
        assert m["blocking_config"]["use_second_token"] is False

    def test_legacy_blocks_manifest_tolerated_and_recorded(
        self, spark, tmp_path, split
    ):
        """Pre-upgrade checkpoints record no blocking_config: the
        increment proceeds (warning) and records the config so the NEXT
        drift is caught."""
        import json

        _, part1, part2 = split
        d = tmp_path / "g3"
        run_pipeline(spark, part1, _cfg(d))
        ck = StageCheckpoint(d)
        m = ck.read_manifest("blocks")
        del m["blocking_config"]
        ck.manifest_path("blocks").write_text(json.dumps(m))
        incremental_update(spark, part2, _cfg(d))
        assert "blocking_config" in ck.read_manifest("blocks")


class TestRecoveryPrecision:
    """_recover_pending must restore EXACTLY the pre-increment version
    (fingerprint-matched), never 'the newest snapshot' — after an
    interleaved crashed rebuild the newest snapshot can be the very
    half-committed state recovery exists to erase."""

    def _three_versions(self, spark, tmp_path, name):
        ck = StageCheckpoint(tmp_path / name)
        fps = []
        for i in range(3):
            rows = [(j, f"v{i}") for j in range(i + 2)]
            ck.write(
                "scores",
                spark.createDataFrame(rows, "id long, s string"),
                input_fingerprint=f"fp{i}",
            )
            fps.append(ck.read_manifest("scores")["output_fingerprint"])
        return ck, fps

    def test_rollback_targets_marker_fingerprint_not_newest(
        self, spark, tmp_path
    ):
        import json

        from poi_name_matching_spark.plans.incremental import _recover_pending

        ck, fps = self._three_versions(spark, tmp_path, "rp1")
        # marker says the increment started from version 0 — the NEWEST
        # snapshot holds version 1; blind latest-rollback would pick it
        (ck.root / "_incr_pending.json").write_text(
            json.dumps({"in_fp": "x", "stage_fps": {"scores": fps[0]}})
        )
        rec = _recover_pending(spark, ck)
        assert rec["rolled_back"] == ["scores"]
        m = ck.read_manifest("scores")
        assert m["output_fingerprint"] == fps[0]
        assert ck.load(spark, "scores").count() == 2  # v0 had 2 rows
        assert not (ck.root / "_incr_pending.json").exists()

    def test_unmatchable_fingerprint_raises_and_keeps_marker(
        self, spark, tmp_path
    ):
        import json

        from poi_name_matching_spark.plans.incremental import _recover_pending

        ck, fps = self._three_versions(spark, tmp_path, "rp2")
        (ck.root / "_incr_pending.json").write_text(
            json.dumps({"in_fp": "x", "stage_fps": {"scores": "rows=9,xor=9"}})
        )
        with pytest.raises(RuntimeError, match="re-run run_pipeline"):
            _recover_pending(spark, ck)
        assert (ck.root / "_incr_pending.json").exists()  # error repeats
        # current version untouched by the failed recovery
        assert ck.read_manifest("scores")["output_fingerprint"] == fps[2]

    def test_torn_marker_is_discarded_as_no_op(self, spark, tmp_path):
        from poi_name_matching_spark.plans.incremental import _recover_pending

        ck, fps = self._three_versions(spark, tmp_path, "rp3")
        (ck.root / "_incr_pending.json").write_text('{"in_fp": "tru')
        assert _recover_pending(spark, ck) is None
        assert not (ck.root / "_incr_pending.json").exists()
        assert ck.read_manifest("scores")["output_fingerprint"] == fps[2]


class TestConfigInStageIdentity:
    """run_pipeline's stage cache keys must include the configs the
    stages were built under — a resume keyed on data fingerprints alone
    would cache-HIT stages built under a different config."""

    def test_threshold_retune_recomputes_components_reuses_scores(
        self, spark, tmp_path, split
    ):
        from poi_name_matching_spark.operators.scoring import ScoringConfig

        _, part1, _ = split
        d = tmp_path / "ci1"
        r1 = run_pipeline(
            spark, part1, PipelineConfig(checkpoint_dir=str(d))
        )
        # retune: scores are threshold-independent (cache hit); the
        # components stage must RECOMPUTE, not return the old clusters
        r2 = run_pipeline(
            spark,
            part1,
            PipelineConfig(
                checkpoint_dir=str(d),
                scoring=ScoringConfig(threshold=0.99),
            ),
        )
        assert "scores" in r2.cached_stages
        assert "components" not in r2.cached_stages
        assert r2.stats["n_components"] > r1.stats["n_components"]
        # and the retune is itself resumable
        r3 = run_pipeline(
            spark,
            part1,
            PipelineConfig(
                checkpoint_dir=str(d),
                scoring=ScoringConfig(threshold=0.99),
            ),
        )
        assert "components" in r3.cached_stages

    def test_retune_then_increment_at_old_threshold_forces_full_cc(
        self, spark, tmp_path, split
    ):
        """After a batch threshold retune, the scores manifest's
        threshold extra is STALE (scores cache-hit keeps the original
        extras while components rebuild at the new threshold). The
        operating-point guard must read the threshold off the
        COMPONENTS manifest: an increment back at the original
        threshold would otherwise pass the stale comparison and
        contract clusters built at a different operating point —
        historical pairs scoring between the two thresholds would
        never merge."""
        from poi_name_matching_spark.operators.scoring import ScoringConfig

        _, part1, part2 = split
        d = tmp_path / "ci4"
        base = PipelineConfig(checkpoint_dir=str(d))
        run_pipeline(spark, part1, base)
        retuned = PipelineConfig(
            checkpoint_dir=str(d), scoring=ScoringConfig(threshold=0.99)
        )
        r2 = run_pipeline(spark, part1, retuned)
        assert "scores" in r2.cached_stages  # the staleness precondition
        # increment at the ORIGINAL threshold: components were built at
        # 0.99, so contraction would be unsound — must fall back to full
        inc = incremental_update(spark, part2, base)
        assert inc.stats["components_mode"] == "full"
        assert (
            inc.stats["components_full_reason"] == "operating_point_changed"
        )
        # matches a from-scratch batch run at that threshold
        batch = run_pipeline(
            spark,
            part1.unionByName(part2),
            PipelineConfig(checkpoint_dir=str(tmp_path / "ci4b")),
        )
        assert _clusters(inc.components) == _clusters(batch.components)
        # and an increment AT the retuned threshold stays incremental
        d2 = tmp_path / "ci4c"
        run_pipeline(spark, part1, PipelineConfig(checkpoint_dir=str(d2)))
        run_pipeline(
            spark,
            part1,
            PipelineConfig(
                checkpoint_dir=str(d2), scoring=ScoringConfig(threshold=0.99)
            ),
        )
        inc2 = incremental_update(
            spark,
            part2,
            PipelineConfig(
                checkpoint_dir=str(d2), scoring=ScoringConfig(threshold=0.99)
            ),
        )
        assert inc2.stats["components_mode"] == "incremental"

    def test_scoring_param_drift_without_rescore_raises(
        self, spark, tmp_path, split
    ):
        """The drift guard must cover the FULL scoring config, not just
        the kernel name: an increment scored under e.g. a different
        min_df appends values from a different scoring regime into the
        same column — exactly the mix the kernel guard refuses."""
        from poi_name_matching_spark.operators.scoring import ScoringConfig

        _, part1, part2 = split
        d = tmp_path / "ci5"
        run_pipeline(spark, part1, PipelineConfig(checkpoint_dir=str(d)))
        drifted = PipelineConfig(
            checkpoint_dir=str(d), scoring=ScoringConfig(min_df=50)
        )
        before = StageCheckpoint(d).read_manifest("scores")
        with pytest.raises(ValueError, match="scoring config"):
            incremental_update(spark, part2, drifted)
        assert StageCheckpoint(d).read_manifest("scores") == before
        # a threshold-only change is NOT drift (scores are
        # threshold-independent); it just forces one full CC
        moved = PipelineConfig(
            checkpoint_dir=str(d),
            scoring=ScoringConfig(threshold=0.495),
        )
        inc = incremental_update(spark, part2, moved)
        assert inc.stats["components_mode"] == "full"
        # rescore_all makes the param change legal and records it
        d2 = tmp_path / "ci5b"
        run_pipeline(spark, part1, PipelineConfig(checkpoint_dir=str(d2)))
        incremental_update(
            spark,
            part2,
            PipelineConfig(
                checkpoint_dir=str(d2), scoring=ScoringConfig(min_df=50)
            ),
            rescore_all=True,
        )
        m = StageCheckpoint(d2).read_manifest("scores")
        assert m["scoring_config"]["min_df"] == 50

    def test_blocking_change_rebuilds_blocks_unblocking_increments(
        self, spark, tmp_path, split
    ):
        """The drift guard's prescribed remediation must WORK: a batch
        re-run with the new blocking config rebuilds the blocks stage
        (no silent cache hit on config-A blocks), after which the
        increment under the new config proceeds."""
        from poi_name_matching_spark.operators.blocking import BlockingConfig

        _, part1, part2 = split
        d = tmp_path / "ci2"
        run_pipeline(spark, part1, PipelineConfig(checkpoint_dir=str(d)))
        new_cfg = PipelineConfig(
            checkpoint_dir=str(d),
            blocking=BlockingConfig(use_second_token=True),
        )
        with pytest.raises(ValueError, match="blocking config"):
            incremental_update(spark, part2, new_cfg)
        r = run_pipeline(spark, part1, new_cfg)  # the remediation
        assert "blocks" not in r.cached_stages
        m = StageCheckpoint(d).read_manifest("blocks")
        assert m["blocking_config"]["use_second_token"] is True
        inc = incremental_update(spark, part2, new_cfg)  # now legal
        assert inc.stats["n_new_convs"] > 0

    def test_incremental_retention_follows_cfg(self, spark, tmp_path, split):
        """cfg.expire_keep_last=None (keep everything) must hold through
        incremental_update without repeating it per call."""
        _, part1, part2 = split
        d = tmp_path / "ci3"
        cfg = PipelineConfig(checkpoint_dir=str(d), expire_keep_last=None)
        run_pipeline(spark, part1, cfg)
        ck = StageCheckpoint(d)
        incremental_update(spark, part2, cfg)
        n_after_1 = len(ck.snapshot_versions("components"))
        incremental_update(spark, part2, cfg)  # redelivery: more snapshots
        assert len(ck.snapshot_versions("components")) > n_after_1 >= 1
        # explicit override still wins
        incremental_update(spark, part2, cfg, expire_keep_last=1)
        assert len(ck.snapshot_versions("components")) == 1


def test_failed_increment_releases_persisted_handles(
    spark, tmp_path, split, monkeypatch
):
    """A FAILED increment must not pin cached copies of its
    signatures/blocks/pairs in executor storage: a long-lived driver
    retrying per micro-batch would otherwise accumulate one leaked cache
    entry set per failure. Every DataFrame persisted during the call —
    incremental_update's own handles and any operator-internal ones —
    must be uncached once the exception propagates (the finally path)."""
    # patch the CONCRETE class: in PySpark 4 pyspark.sql.DataFrame is
    # the abstract facade; sessions hand out classic.dataframe.DataFrame
    from pyspark.sql.classic.dataframe import DataFrame

    _, part1, part2 = split
    d = tmp_path / "incleak"
    run_pipeline(spark, part1, _cfg(d))

    tracked = []
    orig_persist = DataFrame.persist

    def tracking_persist(self, *a, **k):
        out = orig_persist(self, *a, **k)
        tracked.append(out)
        return out

    monkeypatch.setattr(DataFrame, "persist", tracking_persist)

    def boom(self, *a, **k):
        raise RuntimeError("injected commit failure")

    # first ckpt.append is the scores commit — AFTER all four persists
    monkeypatch.setattr(StageCheckpoint, "append", boom)
    with pytest.raises(RuntimeError, match="injected commit failure"):
        incremental_update(spark, part2, _cfg(d))

    # the failure must have happened past the persist sites, else the
    # test asserts nothing
    assert len(tracked) >= 3
    leaked = [
        df
        for df in tracked
        if df.storageLevel.useMemory or df.storageLevel.useDisk
    ]
    assert not leaked, f"{len(leaked)} cached handles leaked by failure"


def test_incremental_auto_compaction(spark, tmp_path, split):
    """cfg.compact_above_files: after the commit, stages whose file
    count exceeds the bound are compacted (fingerprint-preserving),
    the returned plans read the live files, and a follow-up increment
    (incl. redelivery dedup against the compacted stages) still works."""
    full, part1, part2 = split
    d = tmp_path / "inccmp"
    cfg = PipelineConfig(checkpoint_dir=str(d), compact_above_files=1)
    run_pipeline(spark, part1, cfg)
    ck = StageCheckpoint(d)
    fp_before = {
        s: ck.read_manifest(s)["output_fingerprint"]
        for s in ("signatures", "scores")
    }

    inc = incremental_update(spark, part2, cfg)
    assert "compactions" in inc.stats and inc.stats["compactions"]
    for stage, res in inc.stats["compactions"].items():
        assert res["compacted"], stage
        assert len(ck._data_files(stage)) <= res["files_after"], stage
    # components is fully REWRITTEN by every increment, so compacting it
    # post-commit is waste the next commit discards — it must be exempt
    # even at this bound (1 file) that every multi-file stage trips
    assert "components" not in inc.stats["compactions"]
    # returned plans must read the live (compacted) files
    assert inc.components.count() == N
    assert inc.signatures.count() == N
    # fingerprints reflect the merged content, not the compaction
    # (compaction is invisible; the increment changed them)
    for s, fp in fp_before.items():
        assert ck.read_manifest(s)["output_fingerprint"] != fp, s

    # follow-up increment: full redelivery over compacted stages is a
    # clean no-op commit (anti-joins read the compacted data correctly)
    inc2 = incremental_update(spark, part2, cfg)
    assert inc2.stats["n_new_convs"] == 0
    assert inc2.stats["n_new_pairs"] == 0


def test_incremental_entry_heals_plain_half_archive(spark, tmp_path, split):
    """A half-archive left by a crashed BATCH write (no compaction
    marker) must resume through incremental_update with zero recompute —
    the same fingerprint-verified heal the batch resume path applies."""
    full, part1, part2 = split
    d = tmp_path / "incha"
    run_pipeline(spark, part1, _cfg(d))
    ck = StageCheckpoint(d)
    # strand the scores manifest in the next snapshot slot, data intact
    v = (ck.snapshot_versions("scores") or [0])[-1] + 1
    slot = ck._snapshots_dir("scores") / f"v{v}"
    slot.mkdir(parents=True)
    ck.manifest_path("scores").rename(slot / "_manifest.json")
    assert ck.read_manifest("scores") is None

    inc = incremental_update(spark, part2, _cfg(d))
    assert inc.stats["n_new_convs"] > 0
    assert ck.read_manifest("scores") is not None


_KILL_CHILD = r"""
import os, signal, sys

mode, out = sys.argv[1], sys.argv[2]
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

spark = (
    SparkSession.builder.master("local[4]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
from poi_name_matching_spark.data import generate_transcripts
from poi_name_matching_spark.data.transcripts import TRANSCRIPTS_SCHEMA
from poi_name_matching_spark.plans.incremental import incremental_update
from poi_name_matching_spark.plans.pipeline import PipelineConfig
from poi_name_matching_spark.sources.checkpoint import StageCheckpoint

if mode == "increment":
    res = generate_transcripts(n_convs=120, seed=21)
    full = spark.createDataFrame(res.rows, TRANSCRIPTS_SCHEMA)
    convs = sorted({r[0] for r in res.rows})
    old = set(convs[: int(120 * 0.75)])
    part2 = full.filter(~F.col("conv_id").isin(old))
    orig = StageCheckpoint.append

    def killing(self, stage, *a, **k):
        r = orig(self, stage, *a, **k)
        if stage == "scores":
            os.kill(os.getpid(), signal.SIGKILL)  # the real thing
        return r

    StageCheckpoint.append = killing
    incremental_update(spark, part2, PipelineConfig(checkpoint_dir=out))
elif mode == "compact":
    ck = StageCheckpoint(out)
    orig = StageCheckpoint._archive_current

    def killing(self, stage, *a, **k):
        r = orig(self, stage, *a, **k)
        os.kill(os.getpid(), signal.SIGKILL)  # mid-swap: marker armed, manifest archived
        return r

    StageCheckpoint._archive_current = killing
    ck.compact(spark, "scores", target_file_bytes=1 << 20)
raise SystemExit(3)  # the kill must have fired; reaching here is a bug
"""


def _run_kill_child(mode, out):
    import subprocess
    import sys

    return subprocess.run(
        [sys.executable, "-c", _KILL_CHILD, mode, str(out)],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )


def test_real_process_kill(spark, tmp_path, split):
    """Integration twin of the simulated-crash suite: a subprocess
    driver is SIGKILLed (no atexit, no JVM shutdown hooks, no rollback
    code runs) mid-increment and later mid-compaction; on restart the
    WAL marker + snapshot rollback must yield exactly-once clusters
    bit-identical to a never-crashed run, and the compaction marker
    must self-heal the half-swapped stage."""
    full, part1, part2 = split
    d, clean = tmp_path / "rk", tmp_path / "rkclean"
    run_pipeline(spark, part1, _cfg(d))
    run_pipeline(spark, part1, _cfg(clean))

    # --- kill -9 mid-increment (right after the scores append) ---
    p = _run_kill_child("increment", d)
    assert p.returncode == -9, (p.returncode, p.stdout[-2000:], p.stderr[-2000:])
    assert (d / "_incr_pending.json").exists()

    inc = incremental_update(spark, part2, _cfg(d))
    assert not (d / "_incr_pending.json").exists()
    assert inc.stats["recovered_rollback"]["rolled_back"], "rollback must have run"
    ref = incremental_update(spark, part2, _cfg(clean))
    ck, ck_ref = StageCheckpoint(d), StageCheckpoint(clean)
    for s in ("signatures", "blocks", "candidate_pairs", "scores", "components"):
        assert (
            ck.read_manifest(s)["output_fingerprint"]
            == ck_ref.read_manifest(s)["output_fingerprint"]
        ), s
    assert _clusters(inc.components) == _clusters(ref.components)

    # --- kill -9 mid-compaction swap (marker armed, manifest archived) ---
    m_before = ck.read_manifest("scores")
    p = _run_kill_child("compact", d)
    assert p.returncode == -9, (p.returncode, p.stdout[-2000:], p.stderr[-2000:])
    assert ck._compact_marker("scores").exists()
    assert ck.read_manifest("scores") is None  # manifest-less mid-swap

    assert ck.heal_crashed_compaction("scores", spark=spark)
    assert ck.read_manifest("scores") == m_before
    assert not ck._compact_marker("scores").exists()
    rows = ck.load(spark, "scores").count()
    assert rows == m_before["rows"]


def test_multi_increment_drift_bounded(spark, tmp_path):
    """The drift-study pin (SCALE.md §"Incremental-path drift"): a base
    corpus plus FIVE default-mode increments ends within 0.001 pairwise
    F1 of a from-scratch batch run on the identical corpus — the
    incremental path's two documented divergences (stale historical
    df-maps, kept old×old pairs in re-salted blocks) stay quality-
    neutral at the studied sizes. scripts/incremental_drift.py measures
    the same bound at 30k+ conversations."""
    from poi_name_matching_spark.data.transcripts import truth_df
    from poi_name_matching_spark.operators.evaluation import (
        pairwise_cluster_f1,
    )

    total, base, k = 600, 400, 5
    res = generate_transcripts(n_convs=total, seed=33)
    full = spark.createDataFrame(res.rows, TRANSCRIPTS_SCHEMA)
    truth = truth_df(spark, n_convs=total, seed=33)
    convs = sorted({r[0] for r in res.rows})
    per = (total - base) // k

    batch = run_pipeline(spark, full, _cfg(tmp_path / "drift_batch"))
    f1_batch = pairwise_cluster_f1(batch.components, truth).f1

    def _slice(lo, hi):
        return full.filter((F.col("conv_id") >= lo) & (F.col("conv_id") <= hi))

    cfg = _cfg(tmp_path / "drift_inc")
    run_pipeline(spark, _slice(convs[0], convs[base - 1]), cfg)
    inc = None
    for i in range(k):
        sl = convs[base + i * per : base + (i + 1) * per]
        inc = incremental_update(spark, _slice(sl[0], sl[-1]), cfg)
    f1_inc = pairwise_cluster_f1(inc.components, truth).f1

    assert abs(f1_inc - f1_batch) < 0.001, (f1_inc, f1_batch)
