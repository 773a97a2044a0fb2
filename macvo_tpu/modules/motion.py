"""Motion models — initial pose guess for each incoming frame
(reference: Module/MotionModel.py).

``predict(frame, flow, depth) -> (7,) SE3 world pose``; ``update(pose)``
feeds back the optimizer result. The learned ``TartanMotionNet`` lives with
the network family (models/tartanvo) and registers itself here on import.
"""

from __future__ import annotations

from pathlib import Path
from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.frame import StereoFrame
from ..geometry import se3
from ..utils.registry import RegisteredConfigTestable


class IMotionModel(RegisteredConfigTestable, register=False):
    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config

    def predict(
        self, frame: StereoFrame, flow: Optional[jnp.ndarray], depth: Optional[jnp.ndarray]
    ) -> jnp.ndarray:
        """Predicted world-frame SE3 pose (7,) of ``frame``."""
        raise NotImplementedError

    def update(self, pose: jnp.ndarray) -> None:
        """Receive the optimized pose of the last predicted frame."""
        raise NotImplementedError


class StaticMotionModel(IMotionModel):
    """Constant-pose model: predicts the previous (optimized) pose
    (reference: MotionModel.py:126-145; used by Performant/Fast configs)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.prev_pose: Optional[jnp.ndarray] = None

    def predict(self, frame, flow, depth) -> jnp.ndarray:
        if self.prev_pose is None:
            self.prev_pose = se3.identity()
            return self.prev_pose
        return self.prev_pose

    def update(self, pose: jnp.ndarray) -> None:
        self.prev_pose = pose

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class GTMotionwithNoise(IMotionModel):
    """Ground-truth inter-frame motion (optionally perturbed) applied to the
    previous optimized pose (reference: MotionModel.py:45-87)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.prev_pose: Optional[jnp.ndarray] = None
        self.prev_gt_pose: Optional[jnp.ndarray] = None
        self._key = jax.random.PRNGKey(getattr(config, "seed", 0))
        self._calls = 0

    def _noise(self) -> jnp.ndarray:
        if self.config.noise_std == 0.0:
            return se3.identity()
        self._calls += 1
        key = jax.random.fold_in(self._key, self._calls)
        twist = self.config.noise_std * jax.random.normal(key, (6,))
        return se3.exp(twist)

    def predict(self, frame, flow, depth) -> jnp.ndarray:
        assert frame.gt_pose is not None, "GTMotionwithNoise requires gt_pose"
        gt = jnp.asarray(frame.gt_pose).reshape(7)
        if self.prev_pose is None or self.prev_gt_pose is None:
            self.prev_pose = se3.identity()
            self.prev_gt_pose = gt
            return self.prev_pose
        gt_motion = se3.mul(se3.inv(self.prev_gt_pose), gt)
        predict = se3.mul(self.prev_pose, se3.mul(gt_motion, self._noise()))
        self.prev_pose = predict
        self.prev_gt_pose = gt
        return predict

    def update(self, pose: jnp.ndarray) -> None:
        self.prev_pose = pose

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "noise_std": lambda n: isinstance(n, (int, float)) and n >= 0.0,
        })


class ReadPoseFile(IMotionModel):
    """External Nx7 pose file as motion source: applies the *motion* between
    consecutive file poses onto the (possibly optimized) previous pose
    (reference: MotionModel.py:149-203)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.prev_pose: Optional[jnp.ndarray] = None
        self.prev_file_pose: Optional[jnp.ndarray] = None
        self.poses = self._load(Path(config.pose_file))

    @staticmethod
    def _load(path: Path) -> jnp.ndarray:
        if not path.exists():
            raise FileNotFoundError(f"Cannot read pose file at {path}")
        if path.suffix == ".npy":
            data = np.load(str(path))
        elif path.suffix == ".txt":
            data = np.loadtxt(str(path))
        else:
            raise NameError(f"Cannot handle pose file with suffix '{path.suffix}'")
        assert data.ndim == 2 and data.shape[1] == 7
        return jnp.asarray(data, dtype=jnp.float32)

    def predict(self, frame, flow, depth) -> jnp.ndarray:
        file_pose = self.poses[frame.frame_idx]
        if self.prev_pose is None or self.prev_file_pose is None:
            self.prev_pose = se3.identity()
            self.prev_file_pose = file_pose
            return self.prev_pose
        motion = se3.mul(se3.inv(self.prev_file_pose), file_pose)
        predict = se3.mul(self.prev_pose, motion)
        self.prev_pose = predict
        self.prev_file_pose = file_pose
        return predict

    def update(self, pose: jnp.ndarray) -> None:
        self.prev_pose = pose

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"pose_file": lambda s: isinstance(s, str)})
