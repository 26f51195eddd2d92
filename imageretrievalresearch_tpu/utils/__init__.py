"""Utilities: metric logging, checkpointing, profiling, analysis tools."""

from imageretrievalresearch_tpu.utils.logging import MetricLogger
from imageretrievalresearch_tpu.utils.checkpoint import CheckpointManager
from imageretrievalresearch_tpu.utils.analysis import (
    roc_curve,
    cos_sim_score_with_threshold,
    cos_sim_score_booster,
)

__all__ = ["MetricLogger", "CheckpointManager", "roc_curve",
           "cos_sim_score_with_threshold", "cos_sim_score_booster"]
