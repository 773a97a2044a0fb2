"""Terminal map post-processors: repair ``need_interp`` frame poses
(reference: Module/MapProcessor.py).

Both processors mutate the frame store's pose column in place and return the
indices that were interpolated.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np

from ..geometry import se3
from ..geometry.interp import cumulative_motions, interpolate_pose
from ..utils.registry import RegisteredConfigTestable
from ..worldmap.storage import Store


class IMapProcessor(RegisteredConfigTestable, register=False):
    def __init__(self, config: SimpleNamespace | None) -> None:
        self.config = config

    def elaborate_map(self, frames: Store) -> np.ndarray:
        """Fix up the trajectory; returns indices of repaired frames."""
        raise NotImplementedError


class Naive(IMapProcessor):
    """No-op processor (reference baseline usage, Odometry/BaselineTartanVO.py:22)."""

    def elaborate_map(self, frames: Store) -> np.ndarray:
        return np.zeros((0,), dtype=np.int64)

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class PoseInterpolate(IMapProcessor):
    """se3-geodesic interpolation of lost-track poses from good neighbours
    (reference: MapProcessor.py:28-49)."""

    def elaborate_map(self, frames: Store) -> np.ndarray:
        poses = frames.data["pose"]
        bad = frames.data["need_interp"].copy()
        # Endpoints can't be interpolated — the reference clears a 5-frame pad.
        bad[:5] = False
        bad[-5:] = False
        bad_idx = np.nonzero(bad)[0]
        if bad_idx.size == 0:
            return bad_idx
        good_idx = np.nonzero(~bad)[0]
        interp, _ = interpolate_pose(
            jnp.asarray(poses[good_idx]),
            jnp.asarray(good_idx, dtype=jnp.float32),
            jnp.asarray(bad_idx, dtype=jnp.float32),
        )
        poses[bad_idx] = np.asarray(interp, dtype=np.float32)
        return bad_idx

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {})


class MotionInterpolate(IMapProcessor):
    """Interpolate in *motion* space, then rebuild the trajectory with a
    quaternion-renormalized cumulative product (reference: MapProcessor.py:52-80,
    citing pypose cumprod instability — our scan renormalizes every step)."""

    def elaborate_map(self, frames: Store) -> np.ndarray:
        poses = frames.data["pose"]
        n = poses.shape[0]
        if n < 2:
            return np.zeros((0,), dtype=np.int64)
        bad = frames.data["need_interp"][1:].copy()
        bad[:2] = False
        bad[-2:] = False
        bad_idx = np.nonzero(bad)[0]
        if bad_idx.size == 0:
            return bad_idx

        all_poses = jnp.asarray(poses, dtype=jnp.float64)
        motions = se3.mul(se3.inv(all_poses[:-1]), all_poses[1:])
        good_idx = np.nonzero(~bad)[0]
        interp, _ = interpolate_pose(
            motions[jnp.asarray(good_idx)],
            jnp.asarray(good_idx, dtype=jnp.float64),
            jnp.asarray(bad_idx, dtype=jnp.float64),
        )
        motions = motions.at[jnp.asarray(bad_idx)].set(interp)
        traj = cumulative_motions(all_poses[0], motions)
        poses[:] = np.asarray(traj, dtype=np.float32)
        return bad_idx + 1

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {})
