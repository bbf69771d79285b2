"""Readers and checkpointed sinks.

The reference persists every stage as a pickle and reloads it later
(``load_data/load_osm.py:85``, ``ml_similarity_metrics.py:505,562``) — its
ad-hoc resumability story. Ours is parquet stage checkpoints with JSON
manifests carrying per-partition lineage + metrics (north-rule
requirement); Iceberg is the production target, plain parquet directories
are the in-sandbox stand-in (same writer API shape).
"""

from .checkpoint import StageCheckpoint, stage_fingerprint
from .plots import confusion_matrix_svg, importance_bars_svg, metric_bars_svg
from .readers import (
    read_csv_entities,
    read_json_entities,
    read_parquet_table,
    read_transcripts,
)

__all__ = [
    "StageCheckpoint",
    "stage_fingerprint",
    "confusion_matrix_svg",
    "importance_bars_svg",
    "metric_bars_svg",
    "read_csv_entities",
    "read_json_entities",
    "read_parquet_table",
    "read_transcripts",
]
