"""Trajectory container + sandbox loading + time alignment
(reference: Utility/Trajectory.py:33-246).

A trajectory is an (N,7) pose array with (N,) timestamps. ``from_sandbox``
loads ``poses.npy`` / ``ref_poses.npy`` written by the odometry runtime and
interpolates ground truth onto the estimate's timestamps
(``align_time="est->gt"`` semantics).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from ..geometry.interp import interpolate_pose
from ..utils.sandbox import Sandbox
from . import metrics


@dataclasses.dataclass
class Trajectory:
    poses: np.ndarray        # (N,7) [t, q_xyzw]
    times: np.ndarray        # (N,) seconds
    name: str = ""

    def __len__(self) -> int:
        return self.poses.shape[0]

    @classmethod
    def from_file(cls, path: str | Path, name: str = "") -> "Trajectory":
        """Load an (N,8) [time, t, q] npy file (odometry output layout)."""
        data = np.load(path)
        assert data.ndim == 2 and data.shape[1] == 8, f"expected (N,8), got {data.shape}"
        return cls(poses=data[:, 1:8], times=data[:, 0], name=name)

    def align_time_to(self, other: "Trajectory") -> "Trajectory":
        """Interpolate this trajectory's poses onto ``other``'s timestamps."""
        interp, _ = interpolate_pose(
            jnp.asarray(self.poses, dtype=jnp.float64),
            jnp.asarray(self.times, dtype=jnp.float64),
            jnp.asarray(other.times, dtype=jnp.float64),
        )
        return Trajectory(np.asarray(interp), other.times.copy(), self.name)

    def as_motions(self) -> np.ndarray:
        """(N-1,4,4) relative motions."""
        mats = metrics.poses_to_matrices(self.poses)
        return np.linalg.inv(mats[:-1]) @ mats[1:]


def load_sandbox_trajectories(sandbox: Sandbox) -> tuple[Trajectory, Trajectory]:
    """Returns (gt, est) with gt interpolated onto est's timestamps."""
    est = Trajectory.from_file(sandbox.path("poses.npy"), name="est")
    gt = Trajectory.from_file(sandbox.path("ref_poses.npy"), name="gt")
    if gt.times.shape != est.times.shape or not np.allclose(gt.times, est.times):
        gt = gt.align_time_to(est)
    return gt, est


def evaluate_sandbox(sandbox: Sandbox, correct_scale: bool = False) -> dict[str, metrics.MetricStats]:
    gt, est = load_sandbox_trajectories(sandbox)
    return metrics.evaluate_all(gt.poses, est.poses, correct_scale)
