"""Evaluation: trajectory metrics (reference: Evaluation/)."""

from .metrics import (
    MetricStats,
    align_trajectory,
    evaluate_all,
    evaluate_ate,
    evaluate_roe,
    evaluate_rpe,
    evaluate_rte,
    poses_to_matrices,
    umeyama,
)
from .trajectory import Trajectory, evaluate_sandbox, load_sandbox_trajectories

__all__ = [
    "MetricStats", "align_trajectory", "evaluate_all", "evaluate_ate", "evaluate_roe",
    "evaluate_rpe", "evaluate_rte", "poses_to_matrices", "umeyama",
    "Trajectory", "evaluate_sandbox", "load_sandbox_trajectories",
]
