"""End-to-end pipeline plans (checkpointed, resumable)."""

from .pipeline import PipelineConfig, run_pipeline

__all__ = ["PipelineConfig", "run_pipeline"]
