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
from .dense import (
    DepthCovPerformance,
    DepthPerformance,
    FlowCovPerformance,
    FlowPerformance,
    evaluate_depth,
    evaluate_depthcov,
    evaluate_flow,
    evaluate_flowcov,
)
from .trajectory import Trajectory, evaluate_sandbox, load_sandbox_trajectories

__all__ = [
    "MetricStats", "align_trajectory", "evaluate_all", "evaluate_ate", "evaluate_roe",
    "evaluate_rpe", "evaluate_rte", "poses_to_matrices", "umeyama",
    "Trajectory", "evaluate_sandbox", "load_sandbox_trajectories",
    "FlowPerformance", "FlowCovPerformance", "DepthPerformance", "DepthCovPerformance",
    "evaluate_flow", "evaluate_flowcov", "evaluate_depth", "evaluate_depthcov",
]
