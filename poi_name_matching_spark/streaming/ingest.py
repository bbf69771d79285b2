"""Streaming ingest of transcripts → incrementally maintained signatures.

Design (Structured Streaming, micro-batch):

* source: file stream of parquet drops with the transcripts schema
  (Iceberg/Kafka in production — same unbounded-DataFrame surface).
* watermark on ``ts`` bounds state: a conversation whose turns span
  longer than the watermark horizon is finalized from the last complete
  view (the batch pipeline re-derives exact signatures nightly; the
  stream keeps the candidate-facing table fresh).
* ``foreachBatch`` + groupBy(conv_id) per micro-batch, merged into the
  signatures store keyed by conv_id: turn lists from different batches
  are concatenated and re-sorted, so stable turn ordering (the per-row
  invariant) holds regardless of arrival order.
* the store is HASH-BUCKETED by ``pmod(xxhash64(conv_id), N)`` and each
  micro-batch merges + dynamically overwrites ONLY the buckets it
  touches — per-batch work is O(touched buckets), not O(store). A day
  of micro-batches no longer rewrites the full corpus hundreds of
  times; untouched bucket files are left byte-identical on disk. This
  is the parquet stand-in for an Iceberg ``MERGE INTO`` (row-level
  upsert); the bucket count is pinned in a store-level meta file so a
  misconfigured later batch cannot split conversations across two
  bucketings.
"""

from __future__ import annotations

import json
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TRANSCRIPTS_DDL = (
    "conv_id string, turn_idx int, role string, text string, "
    "tool string, ts timestamp"
)

#: default store bucket count — sized so one bucket of a 10^9-conv store
#: is still a few GB of parquet; raise for bigger stores (pinned per
#: store at creation via the meta file)
DEFAULT_STORE_BUCKETS = 64

_META_NAME = "_store_meta.json"


def _store_buckets(store: Path, requested: int) -> int:
    """The store's pinned bucket count (created on first write). A later
    caller asking for a different count gets the PINNED value — silently
    re-bucketing an existing store would leave each conversation's rows
    split across two bucketings (stale rows in the old bucket survive a
    dynamic overwrite of the new one)."""
    meta = store / _META_NAME
    if meta.exists():
        return int(json.loads(meta.read_text())["n_buckets"])
    return int(requested)


def _write_meta(store: Path, n_buckets: int) -> None:
    store.mkdir(parents=True, exist_ok=True)
    (store / _META_NAME).write_text(json.dumps({"n_buckets": int(n_buckets)}))


def _recover_interrupted_migration(store: Path) -> None:
    """Crash recovery for the one-time flat→bucketed migration, which
    swaps directories via two renames (see below). If a crash landed
    between them, the store path is missing but the original flat store
    survives at ``<store>.old`` — restore it and let the migration
    re-run. If both exist, the swap completed and the backup is stale —
    drop it."""
    import shutil

    old = Path(str(store) + ".old")
    if not old.exists():
        return
    if store.exists():
        shutil.rmtree(old)
    else:
        old.rename(store)


def _dynamic_overwrite(final: DataFrame, store_path: str) -> None:
    """Replace exactly the bucket partitions present in ``final``
    (dynamic partition overwrite); all other bucket files keep their
    bytes on disk."""
    spark = final.sparkSession
    overwrite_key = "spark.sql.sources.partitionOverwriteMode"
    try:
        saved = spark.conf.get(overwrite_key)
    except Exception:
        saved = None
    spark.conf.set(overwrite_key, "dynamic")
    try:
        final.write.mode("overwrite").partitionBy("bucket").parquet(store_path)
    finally:
        if saved is None:
            spark.conf.unset(overwrite_key)
        else:
            spark.conf.set(overwrite_key, saved)


def _recover_interrupted_upsert(spark: SparkSession, store: Path) -> None:
    """Crash recovery for the per-batch bucket upsert. The upsert stages
    the COMPLETE merged content of every touched bucket to ``.tmp``,
    then writes a marker, then dynamically overwrites the store, then
    removes marker and tmp (in that order). Spark's dynamic partition
    overwrite is not atomic across partitions — a kill mid-commit can
    leave a touched bucket with its old files deleted and its new files
    half-moved — so a surviving marker means the overwrite may have
    died mid-commit: redo it from the staged tmp copy (idempotent — tmp
    holds the full intended content of exactly the touched buckets) and
    only then clean up. A tmp WITHOUT a marker is pre-overwrite debris:
    the store was never touched; drop it."""
    import shutil

    marker = Path(str(store) + ".upsert_pending")
    tmp = Path(str(store) + ".tmp")
    # reap a marker tmp stranded between write and rename (the rename
    # never happened ⇒ the overwrite never started)
    marker.with_name(marker.name + ".tmp").unlink(missing_ok=True)
    if not marker.exists():
        if tmp.exists():
            shutil.rmtree(tmp)  # staged but never committed — junk
        return
    if not (tmp / "_SUCCESS").exists():
        # marker is written only after the tmp write completed, so this
        # is unreachable by any crash — refuse to guess at hand-edits
        raise RuntimeError(
            f"upsert marker {marker} present but staging dir {tmp} is "
            "incomplete — manual intervention required"
        )
    meta = json.loads(marker.read_text())
    _dynamic_overwrite(spark.read.parquet(str(tmp)), str(store))
    _write_meta(store, int(meta["n_buckets"]))
    marker.unlink()
    shutil.rmtree(tmp, ignore_errors=True)


def read_transcript_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int = 4
) -> DataFrame:
    return (
        spark.readStream.schema(TRANSCRIPTS_DDL)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(path)
    )


def incremental_signatures(
    batch: DataFrame, store_path: str, n_buckets: int = DEFAULT_STORE_BUCKETS
) -> None:
    """Merge one micro-batch of turns into the bucketed signature store.

    Store schema: (conv_id, turns array<struct<turn_idx,text,ts>>),
    partitioned by ``bucket = pmod(xxhash64(conv_id), n_buckets)``.
    Idempotent per (conv_id, turn_idx): re-delivered turns dedupe on the
    TURN KEY (not the full struct), so an at-least-once redelivery with a
    differing ts/text still yields one row per turn — the winner is the
    struct-min (turn_idx, text, ts), deterministic under any arrival
    order/partitioning.

    Scale shape: only the buckets the batch touches are read (partition
    pruning on the ``bucket`` filter), merged, and replaced (dynamic
    partition overwrite). Untouched bucket files are not rewritten —
    per-batch cost is O(batch + touched buckets), independent of total
    store size."""
    spark = batch.sparkSession
    store = Path(store_path)
    _recover_interrupted_migration(store)
    _recover_interrupted_upsert(spark, store)
    n_buckets = _store_buckets(store, n_buckets)
    bucket = F.pmod(F.xxhash64("conv_id"), F.lit(int(n_buckets)))
    incoming = batch.groupBy("conv_id").agg(
        F.collect_list(F.struct("turn_idx", "text", "ts")).alias("turns")
    )
    if (store / _META_NAME).exists():
        # tiny collect: at most n_buckets ints
        touched = [
            r[0]
            for r in incoming.select(bucket.alias("b")).distinct().collect()
        ]
        if not touched:
            return
        existing = spark.read.parquet(store_path).filter(
            F.col("bucket").isin(touched)  # partition-pruned scan
        )
        merged = (
            existing.select("conv_id", "turns")
            .unionByName(incoming)
            .select("conv_id", F.explode("turns").alias("t"))
            .groupBy("conv_id", F.col("t.turn_idx").alias("_turn_key"))
            .agg(F.min("t").alias("t"))
            .groupBy("conv_id")
            .agg(F.sort_array(F.collect_list("t")).alias("turns"))
        )
    elif store.exists():
        # legacy flat (pre-bucketing) store: one-time full migration —
        # merge the whole store and rewrite it bucketed. Later batches
        # take the pruned path above.
        existing = spark.read.parquet(store_path)
        merged = (
            existing.select("conv_id", "turns")
            .unionByName(incoming)
            .select("conv_id", F.explode("turns").alias("t"))
            .groupBy("conv_id", F.col("t.turn_idx").alias("_turn_key"))
            .agg(F.min("t").alias("t"))
            .groupBy("conv_id")
            .agg(F.sort_array(F.collect_list("t")).alias("turns"))
        )
        # crash-safe swap: build the COMPLETE bucketed store (data +
        # meta) in a staging dir first, then rename the flat store away
        # and the staging dir into place. A crash before the first
        # rename leaves the flat store untouched (migration just
        # re-runs); a crash between the renames is healed by
        # _recover_interrupted_migration on the next batch. At no point
        # does deleting the only copy precede writing its replacement.
        import shutil

        staging = Path(str(store) + ".migrating")
        if staging.exists():
            shutil.rmtree(staging)  # stale partial attempt
        merged.withColumn("bucket", bucket).write.mode("overwrite").partitionBy(
            "bucket"
        ).parquet(str(staging))
        _write_meta(staging, n_buckets)
        old = Path(str(store) + ".old")
        store.rename(old)
        staging.rename(store)
        shutil.rmtree(old)
        return
    else:
        # raw-batch check: zero rows iff zero groups, and take(1) on the
        # input short-circuits where isEmpty() on the aggregate would
        # plan a shuffle
        if batch.isEmpty():
            # founding the store on a zero-row batch would write no
            # partition files yet pin the meta file, leaving every later
            # batch's bucketed read to fail on schema inference — defer
            # store creation to the first batch that carries rows
            return
        merged = incoming.select(
            "conv_id", F.sort_array(F.col("turns")).alias("turns")
        )
    merged = merged.withColumn("bucket", bucket)
    # stage to a scratch dir first — both because Spark refuses to
    # overwrite a path it is concurrently reading (the merged plan scans
    # the store) and because the staged copy is the CRASH BACKUP: the
    # dynamic overwrite below is not atomic across partitions, so the
    # marker written between staging and overwrite lets the next batch
    # redo the overwrite from tmp instead of losing a touched bucket's
    # old conversations to a mid-commit kill
    tmp = str(store) + ".tmp"
    merged.write.mode("overwrite").parquet(tmp)
    final = spark.read.parquet(tmp)
    marker = Path(str(store) + ".upsert_pending")
    # durably complete-or-absent (fsync before rename): recovery treats
    # a present marker as "overwrite may have died mid-commit"
    from ..sources.checkpoint import write_json_atomic

    write_json_atomic(marker, {"n_buckets": int(n_buckets)})
    # dynamic mode: ONLY the bucket partitions present in `final`
    # (= the touched buckets) are replaced; the rest keep their files
    _dynamic_overwrite(final, store_path)
    _write_meta(store, n_buckets)
    marker.unlink()  # commit point: overwrite + meta are durable
    import shutil

    # the scratch copy has served its purpose (the dynamic overwrite
    # committed); leaving it would retain a stale extra copy of the
    # touched buckets on disk forever
    shutil.rmtree(tmp, ignore_errors=True)


def signatures_from_store(spark: SparkSession, store_path: str) -> DataFrame:
    """Render the store into the signatures relation (same columns as the
    batch stage, minus tokens which the batch scorer adds).

    Crash debris is handled WITHOUT mutating the store — readers must
    never repair in place, because a reader concurrent with a live
    writer would race it (deleting the writer's in-flight staging dir,
    or running a second dynamic overwrite of the same buckets
    concurrently with the writer's). Instead the reader composes the
    committed view around the debris:

    * mid-migration swap (store dir missing, ``.old`` backup present):
      read the backup — the pre-migration store IS the committed state
      (the migrating batch's stream checkpoint never committed, so it
      will be redelivered).
    * mid-upsert commit (marker + complete staged copy present): a
      touched bucket's old files may be half-deleted, so read the store
      with the touched buckets REPLACED by the staged copy (which holds
      their complete intended content); on a founding crash (no store
      meta yet) the staged copy alone is the whole store.
    * staging dir without a marker: in-flight (or dead) pre-commit
      debris — the store was never touched; ignore it. Only the writer
      reaps it.

    The actual repair still happens exactly once, in the serialized
    writer path (``incremental_signatures``). As with any parquet store
    that is not a transactional table format, a reader whose lazy plan
    overlaps a writer's commit can fail transiently on moved files —
    re-read; what is guaranteed is that a quiesced store always renders
    its committed content, and a reader never damages a live writer."""
    store_dir = Path(store_path)
    old = Path(str(store_dir) + ".old")
    marker = Path(str(store_dir) + ".upsert_pending")
    tmp = Path(str(store_dir) + ".tmp")
    base = store_path if store_dir.exists() or not old.exists() else str(old)
    rel = None
    if marker.exists() and (tmp / "_SUCCESS").exists():
        staged_full = spark.read.parquet(str(tmp))
        staged = staged_full.select("conv_id", "turns")
        if (Path(base) / _META_NAME).exists():
            # tiny collect: the staged copy holds only the touched
            # buckets, so this is ≤ n_buckets ints
            touched = [
                r[0] for r in staged_full.select("bucket").distinct().collect()
            ]
            rel = (
                # explicit schema (the staged copy's — same relation):
                # when the crash debris covers EVERY populated bucket,
                # the base store has no data files left and schema
                # inference would fail
                spark.read.schema(staged_full.schema)
                .parquet(base)
                .filter(~F.col("bucket").isin(touched))
                .select("conv_id", "turns")
                .unionByName(staged)
            )
        else:
            # founding upsert crashed mid-commit: the store dir is absent
            # or holds only half-moved files; the staged copy is complete
            rel = staged
    if rel is None:
        rel = spark.read.parquet(base).select("conv_id", "turns")
    return rel.select(
        "conv_id",
        # explicit nullReplacement, matching operators/signatures.py:
        # the default array_join silently DROPS null turn texts, which
        # would collapse ['a', NULL, 'b'] and ['a', 'b'] to the same
        # sig_text (while n_turns says 3) and diverge from the batch
        # stage's signatures
        F.array_join(F.col("turns.text"), " ", "").alias("sig_text"),
        F.size("turns").alias("n_turns"),
        F.array_min(F.col("turns.ts")).alias("first_ts"),
    )


def start_signature_stream(
    spark: SparkSession,
    source_path: str,
    store_path: str,
    checkpoint_path: str,
    watermark: str = "1 hour",
):
    """Wire the stream; returns the StreamingQuery (caller awaits/stops)."""
    stream = read_transcript_stream(spark, source_path).withWatermark(
        "ts", watermark
    )
    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(
            lambda batch, _epoch: incremental_signatures(batch, store_path)
        )
        .trigger(availableNow=True)
        .start()
    )
