"""Streaming record-linkage driver: the FULL pipeline per micro-batch.

``start_signature_stream`` keeps only the signatures table fresh and
leaves blocking/scoring/clustering to a scheduled batch job. This module
closes that gap: each micro-batch of transcripts is merged into the
pipeline checkpoint with ``plans/incremental.incremental_update`` —
blocking keys, pair scores, and connected components stay current as
conversations arrive, and every commit inherits the incremental path's
guarantees (WAL-fenced multi-stage commits, redelivery anti-joins,
snapshot archives). The first non-empty batch bootstraps the checkpoint
with a full ``run_pipeline``.

Exactly-once: Structured Streaming replays a micro-batch after a crash
(at-least-once delivery); ``incremental_update`` makes the replay a
no-op commit (already-known conversations are anti-joined away, a fully
redelivered batch appends zero rows, and a crash mid-commit rolls back
via the WAL marker before the replay applies) — so clusters end up
exactly-once per conversation without relying on the sink being
idempotent by luck.

**Input contract — CLOSED conversations only.** ``incremental_update``
freezes a conv_id on first sight (that is what makes redelivery safe),
so a conversation whose turns straggle across micro-batches would be
signed from its first partial slice and never updated. Feed batches of
complete conversations: either append whole-conversation files to the
watched directory (each parquet drop carries only finished convs — the
pattern the file source naturally gives), or sessionize upstream with
``stateful_signature_stream``'s watermark and emit a conversation only
after it closes. This is the same contract Iceberg-based CDC pipelines
put on their upsert key.

Engine capability beyond the reference (batch-only, SURVEY.md §2.8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..plans.incremental import incremental_update
from ..plans.pipeline import STAGES, PipelineConfig, run_pipeline
from ..sources.checkpoint import StageCheckpoint
from .ingest import read_transcript_stream


def apply_transcript_batch(
    batch: DataFrame, cfg: PipelineConfig
) -> dict | None:
    """Merge one (batch) DataFrame of closed conversations into the
    pipeline checkpoint: bootstrap with ``run_pipeline`` when any stage
    is missing, else ``incremental_update``. Returns the run's stats
    (None for an empty batch). Usable directly for manual micro-batching
    outside Structured Streaming."""
    if batch.isEmpty():
        return None
    spark = batch.sparkSession
    ck = StageCheckpoint(cfg.checkpoint_dir)
    missing = [s for s in STAGES if ck.read_manifest(s) is None]
    if len(missing) == len(STAGES):
        # fresh checkpoint: this batch founds it
        return run_pipeline(spark, batch, cfg).stats
    # PARTIALLY missing stages are NOT a bootstrap trigger: rebuilding
    # from one micro-batch would silently drop every previously-applied
    # conversation from the clusters. Hand the batch to the incremental
    # path — its completeness check self-heals crashed-compaction /
    # half-archive debris and raises a clear error for anything beyond
    # repair, leaving the damaged checkpoint for the operator.
    return incremental_update(spark, batch, cfg).stats


def start_pipeline_stream(
    spark: SparkSession,
    source_path: str,
    cfg: PipelineConfig,
    checkpoint_path: str,
    max_files_per_trigger: int = 4,
):
    """Wire the full-pipeline stream over a watched transcript-parquet
    directory; returns the StreamingQuery (caller awaits/stops).
    ``checkpoint_path`` is the STREAM's offset checkpoint (Spark's),
    separate from ``cfg.checkpoint_dir`` (the pipeline's stage store).
    ``availableNow`` drains everything currently in the directory and
    stops — re-run on a schedule, or swap the trigger for continuous
    micro-batching."""
    stream = read_transcript_stream(
        spark, source_path, max_files_per_trigger=max_files_per_trigger
    )
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_path)
        .foreachBatch(lambda batch, _epoch: apply_transcript_batch(batch, cfg))
        .trigger(availableNow=True)
        .start()
    )
