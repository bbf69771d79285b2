"""Stage checkpoints: parquet data + `_manifest.json` lineage/metrics.

FIXTURES.md §6 layout:

    out/<stage>/data.parquet
    out/<stage>/_manifest.json   {stage, seed/input_fingerprint,
                                  partitions: [{id, rows}], rows, wall_ms}

Resumability contract (north rule): rerunning the pipeline skips any stage
whose manifest exists AND whose recorded ``input_fingerprint`` matches the
fingerprint of the current inputs; deleting one stage directory recomputes
that stage and everything downstream, nothing upstream.

At 100 TB the same structure maps onto Iceberg snapshots (manifest ≙
snapshot summary + partition stats); the JSON file keeps the sandbox
dependency-free while exercising identical control flow.

Snapshots (Iceberg time-travel analog): overwriting a stage ARCHIVES
the previous version by rename into ``<stage>/_snapshots/v<N>/`` —
cheap (no data copy) and it makes stage overwrite non-destructive: a
crash mid-write leaves no current manifest (stage recomputes) while
every previous version survives. ``history`` lists versions,
``rollback`` restores one, ``expire_snapshots`` prunes — the same
operations Iceberg exposes as snapshot metadata / rollback / expire.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stage_fingerprint(df: DataFrame) -> str:
    """Order/partitioning-insensitive content fingerprint: bit_xor of
    row hashes + row count over ALL columns. One scan; used to decide
    stage skip and to verify byte-stability in resumability tests."""
    row = df.agg(
        F.count("*").alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64(*df.columns)), F.lit(0)).alias("h"),
    ).first()
    return f"{row['n']}:{row['h']:x}" if row["h"] >= 0 else f"{row['n']}:m{-row['h']:x}"


class StageCheckpoint:
    """Directory-per-stage checkpoint manager."""

    def __init__(self, root: str | Path):
        self.root = Path(root)
        self.root.mkdir(parents=True, exist_ok=True)

    def _dir(self, stage: str) -> Path:
        return self.root / stage

    def manifest_path(self, stage: str) -> Path:
        return self._dir(stage) / "_manifest.json"

    def read_manifest(self, stage: str) -> dict | None:
        p = self.manifest_path(stage)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def is_complete(self, stage: str, input_fingerprint: str | None = None) -> bool:
        m = self.read_manifest(stage)
        if m is None:
            return False
        if input_fingerprint is not None and m.get("input_fingerprint") != input_fingerprint:
            return False
        return True

    def _table_name(self, stage: str) -> str:
        import hashlib
        import re

        # slug for readability + absolute-path hash for collision proofing:
        # the slug alone collapses 'out-a' and 'out_a' to one name, and a
        # stale catalog table whose bucket metadata no longer matches the
        # files would silently mis-join (Spark trusts bucket metadata)
        root = str(self.root.resolve())
        slug = re.sub(r"[^A-Za-z0-9_]", "_", root).strip("_").lower()[-48:]
        tag = hashlib.sha256(root.encode()).hexdigest()[:8]
        return f"ckpt_{slug}_{tag}_{stage}"

    def load(self, spark: SparkSession, stage: str) -> DataFrame:
        m = self.read_manifest(stage) or {}
        path = self._dir(stage) / "data.parquet"
        if m.get("bucket_by"):
            table = self._table_name(stage)
            if not spark.catalog.tableExists(table):
                # saveAsTable registered the table in the writing
                # session's catalog only (in-memory catalog by default);
                # a fresh process must re-register it from the manifest
                # so the resume contract survives restarts WITH the
                # bucket metadata intact (plain read.parquet would lose
                # the Exchange elision)
                schema_ddl = spark.read.parquet(str(path)).schema.toDDL()
                bucket_by = m["bucket_by"]
                n_buckets = int(m.get("n_buckets", 32))
                spark.sql(
                    f"CREATE TABLE {table} ({schema_ddl}) USING parquet "
                    f"CLUSTERED BY ({bucket_by}) SORTED BY ({bucket_by}) "
                    f"INTO {n_buckets} BUCKETS LOCATION '{path}'"
                )
            return spark.table(table)
        return spark.read.parquet(str(path))

    # ------------------------------------------------------------------
    # snapshots — Iceberg time-travel/rollback/expire analog
    # ------------------------------------------------------------------

    def _snapshots_dir(self, stage: str) -> Path:
        return self._dir(stage) / "_snapshots"

    def snapshot_versions(self, stage: str) -> list[int]:
        d = self._snapshots_dir(stage)
        if not d.exists():
            return []
        return sorted(
            int(p.name[1:])
            for p in d.iterdir()
            if p.is_dir() and p.name.startswith("v") and p.name[1:].isdigit()
        )

    def _snapshot_complete(self, stage: str, version: int) -> bool:
        d = self._snapshots_dir(stage) / f"v{version}"
        return (d / "_manifest.json").exists() and (d / "data.parquet").exists()

    def history(self, stage: str) -> list[dict]:
        """Manifests of every COMPLETE archived version plus the current
        one (current last), each tagged with its ``version`` (``None`` =
        current) — Iceberg's snapshot-history listing. Manifest-only
        slots (the archive crash window) are excluded: they have no
        data to travel to."""
        out = []
        for v in self.snapshot_versions(stage):
            if self._snapshot_complete(stage, v):
                p = self._snapshots_dir(stage) / f"v{v}" / "_manifest.json"
                out.append({"version": v, **json.loads(p.read_text())})
        cur = self.read_manifest(stage)
        if cur is not None:
            out.append({"version": None, **cur})
        return out

    def _archive_current(self, stage: str) -> int | None:
        """Move the current version (data + manifest) into the next
        ``_snapshots/v<N>`` slot. Rename-based: no data copy. The
        MANIFEST moves first: a crash between the two renames then
        leaves the stage with data but no manifest (``is_complete`` is
        false → the stage recomputes, honoring the module contract)
        instead of a manifest pointing at missing data that resume
        would trust and ``load`` would crash on."""
        if self.read_manifest(stage) is None:
            return None
        versions = self.snapshot_versions(stage)
        v = (versions[-1] + 1) if versions else 1
        dst = self._snapshots_dir(stage) / f"v{v}"
        dst.mkdir(parents=True, exist_ok=True)
        for name in ("_manifest.json", "data.parquet"):
            src = self._dir(stage) / name
            if src.exists():
                src.rename(dst / name)
        return v

    def rollback(
        self, stage: str, version: int, spark: SparkSession | None = None
    ) -> None:
        """Make snapshot ``version`` the current stage version. The
        replaced current version is itself archived first (rollback is
        undoable — Iceberg's rollback keeps the abandoned snapshot
        reachable too). Pass ``spark`` when the stage was written
        bucketed so the stale catalog-table registration is dropped and
        ``load`` re-registers from the restored manifest."""
        src = self._snapshots_dir(stage) / f"v{version}"
        if not self._snapshot_complete(stage, version):
            raise FileNotFoundError(
                f"stage {stage!r} has no complete snapshot v{version} "
                "(manifest + data); available: "
                f"{[v for v in self.snapshot_versions(stage) if self._snapshot_complete(stage, v)]}"
            )
        self._archive_current(stage)
        for name in ("data.parquet", "_manifest.json"):
            p = src / name
            if p.exists():
                p.rename(self._dir(stage) / name)
        src.rmdir()
        if spark is not None:
            spark.sql(f"DROP TABLE IF EXISTS {self._table_name(stage)}")

    def expire_snapshots(self, stage: str, keep_last: int = 3) -> list[int]:
        """Delete all but the newest ``keep_last`` snapshots (the current
        version is never touched); returns the expired version numbers —
        Iceberg's ``expireSnapshots`` retention maintenance."""
        import shutil

        versions = self.snapshot_versions(stage)
        expired = versions[: max(0, len(versions) - max(0, int(keep_last)))]
        for v in expired:
            shutil.rmtree(self._snapshots_dir(stage) / f"v{v}")
        return expired

    def write(
        self,
        stage: str,
        df: DataFrame,
        input_fingerprint: str | None = None,
        extra: dict | None = None,
        bucket_by: str | None = None,
        n_buckets: int = 32,
        keep_snapshots: bool = True,
    ) -> DataFrame:
        """Materialize ``df``, record per-partition row counts (lineage +
        skew visibility) and wall time, return the reloaded DataFrame so
        downstream stages read the checkpoint, not the lineage.

        ``bucket_by``: write as a BUCKETED external table instead of
        plain parquet (``bucketBy(n_buckets).sortBy``). Downstream
        equi-joins on the bucket column read the hash-partitioning from
        the table metadata and skip the checkpoint side's Exchange
        entirely — at 100 TB the scores stage's two signature joins
        shuffle only the (small, id-only) pair relation. Size
        ``n_buckets`` to the scoring stage's shuffle parallelism.

        ``keep_snapshots``: archive any existing version of this stage
        into ``_snapshots/`` (rename, no copy) before writing, instead
        of destroying it in place. On by default; pass False for
        scratch runs where retention is unwanted."""
        t0 = time.monotonic()
        if keep_snapshots:
            self._archive_current(stage)
        path = self._dir(stage) / "data.parquet"
        spark = df.sparkSession
        if bucket_by:
            table = self._table_name(stage)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            (
                df.write.bucketBy(int(n_buckets), bucket_by)
                .sortBy(bucket_by)
                .option("path", str(path))
                .mode("overwrite")
                .format("parquet")
                .saveAsTable(table)
            )
            reloaded = spark.table(table)
            extra = {**(extra or {}), "bucket_by": bucket_by, "n_buckets": int(n_buckets)}
        else:
            # a previous BUCKETED write to this stage/root leaves a
            # catalog table pointing at these files; overwriting them
            # with unbucketed data would let a later load() return stale
            # bucket metadata — drop it
            spark.sql(f"DROP TABLE IF EXISTS {self._table_name(stage)}")
            df.write.mode("overwrite").parquet(str(path))
            reloaded = spark.read.parquet(str(path))
        # one scan: per-partition rows (skew visibility) + per-partition
        # xxhash64 xor, combined driver-side into the same format as
        # stage_fingerprint — downstream stages key off this without
        # re-scanning the checkpoint
        part_rows = (
            reloaded.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid")
            .agg(
                F.count("*").alias("count"),
                F.coalesce(
                    F.bit_xor(F.xxhash64(*reloaded.columns)), F.lit(0)
                ).alias("h"),
            )
            .collect()
        )
        h = 0
        for r in part_rows:
            h ^= int(r["h"])
        h &= (1 << 64) - 1
        if h >= 1 << 63:
            h -= 1 << 64
        n = int(sum(r["count"] for r in part_rows))
        out_fp = f"{n}:{h:x}" if h >= 0 else f"{n}:m{-h:x}"
        manifest = {
            "stage": stage,
            "input_fingerprint": input_fingerprint,
            "output_fingerprint": out_fp,
            "rows": n,
            "partitions": sorted(
                [{"id": int(r["_pid"]), "rows": int(r["count"])} for r in part_rows],
                key=lambda d: d["id"],
            ),
            "wall_ms": int((time.monotonic() - t0) * 1000),
            "written_at_unix": int(time.time()),
        }
        if extra:
            manifest.update(extra)
        self.manifest_path(stage).write_text(json.dumps(manifest, indent=2))
        return reloaded

    def get_or_compute(
        self,
        spark: SparkSession,
        stage: str,
        compute,
        input_fingerprint: str | None = None,
        extra: dict | None = None,
        bucket_by: str | None = None,
        n_buckets: int = 32,
    ) -> tuple[DataFrame, bool]:
        """(df, was_cached). ``compute`` is a thunk returning the stage
        DataFrame; only invoked on a manifest miss/mismatch."""
        if self.is_complete(stage, input_fingerprint):
            return self.load(spark, stage), True
        df = self.write(
            stage,
            compute(),
            input_fingerprint,
            extra,
            bucket_by=bucket_by,
            n_buckets=n_buckets,
        )
        return df, False
