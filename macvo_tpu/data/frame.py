"""Frame data model: pytree dataclasses for stereo / inertial frames.

Behavioral parity with the reference frame model (DataLoader/Interface.py:15-200)
— ``StereoData`` carries rectified stereo images, intrinsics, baseline and
optional ground truth; frames compose sensor data with index/gt-pose/time.
TPU-first differences: frames are registered jax pytrees (jit/vmap/pjit
arguments directly), images are channel-last ``(B,H,W,3)`` float32 in [0,1]
(XLA's preferred conv layout), and collation is a stack over the batch axis.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls):
    """Register a dataclass as a pytree; None fields stay None through maps."""
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        children = tuple(getattr(obj, name) for name in fields)
        return children, None

    def unflatten(_, children):
        return cls(*children)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_register
@dataclasses.dataclass
class StereoData:
    """One (batched) stereo observation.

    Shapes: T_BS (B,7) SE3 sensor-to-body; K (B,3,3); baseline (B,);
    time_ns (B,) int64; imageL/imageR (B,H,W,3) float32 in [0,1]; optional
    gt_flow (B,H,W,2), flow_mask (B,H,W,1) bool, gt_depth (B,H,W,1).
    """

    T_BS: jnp.ndarray
    K: jnp.ndarray
    baseline: jnp.ndarray
    time_ns: jnp.ndarray
    imageL: jnp.ndarray
    imageR: jnp.ndarray
    gt_flow: Optional[jnp.ndarray] = None
    flow_mask: Optional[jnp.ndarray] = None
    gt_depth: Optional[jnp.ndarray] = None

    # -- unbatched accessors (reference: DataLoader/Interface.py:80-112) -----
    @property
    def height(self) -> int:
        return self.imageL.shape[1]

    @property
    def width(self) -> int:
        return self.imageL.shape[2]

    @property
    def fx(self) -> float:
        return float(self.K[0, 0, 0])

    @property
    def fy(self) -> float:
        return float(self.K[0, 1, 1])

    @property
    def cx(self) -> float:
        return float(self.K[0, 0, 2])

    @property
    def cy(self) -> float:
        return float(self.K[0, 1, 2])

    @property
    def frame_baseline(self) -> float:
        return float(self.baseline[0])

    @classmethod
    def collate(cls, items: Sequence["StereoData"]) -> "StereoData":
        return _collate_pytrees(items)


@_register
@dataclasses.dataclass
class IMUData:
    """Inertial samples between frames (reference: DataLoader/Interface.py:116-137)."""

    time_ns: jnp.ndarray          # (B, M) int64
    acc: jnp.ndarray              # (B, M, 3)
    gyro: jnp.ndarray             # (B, M, 3)
    gravity: jnp.ndarray          # (B, 3)

    @classmethod
    def collate(cls, items: Sequence["IMUData"]) -> "IMUData":
        return _collate_pytrees(items)


@_register
@dataclasses.dataclass
class AttitudeData:
    """Ground-truth attitude stream (reference: DataLoader/Interface.py:141-164)."""

    time_ns: jnp.ndarray          # (B, M)
    gt_pos: jnp.ndarray           # (B, M, 3)
    gt_vel: jnp.ndarray           # (B, M, 3)
    gt_rot: jnp.ndarray           # (B, M, 4) quaternion xyzw
    init_pos: jnp.ndarray         # (B, 3)
    init_vel: jnp.ndarray         # (B, 3)
    init_rot: jnp.ndarray         # (B, 4)

    @classmethod
    def collate(cls, items: Sequence["AttitudeData"]) -> "AttitudeData":
        return _collate_pytrees(items)


@_register
@dataclasses.dataclass
class StereoFrame:
    """idx (B,), stereo data, optional gt_pose (B,7), time_ns (B,)."""

    idx: jnp.ndarray
    stereo: StereoData
    gt_pose: Optional[jnp.ndarray] = None

    @property
    def frame_idx(self) -> int:
        return int(self.idx[0])

    @property
    def time_ns(self) -> jnp.ndarray:
        return self.stereo.time_ns

    @classmethod
    def collate(cls, items: Sequence["StereoFrame"]) -> "StereoFrame":
        return _collate_pytrees(items)


@_register
@dataclasses.dataclass
class StereoInertialFrame(StereoFrame):
    """Stereo frame + IMU + attitude (reference: DataLoader/Interface.py:198-200)."""

    imu: Optional[IMUData] = None
    attitude: Optional[AttitudeData] = None


@_register
@dataclasses.dataclass
class FramePair:
    """Training pair of consecutive frames (reference: Interface.py:189-191)."""

    cur: StereoFrame
    nxt: StereoFrame

    @classmethod
    def collate(cls, items: Sequence["FramePair"]) -> "FramePair":
        return _collate_pytrees(items)


def _collate_pytrees(items: Sequence[Any]) -> Any:
    """Stack a list of single-item pytrees along the existing batch axis."""
    def stack(*leaves):
        if any(leaf is None for leaf in leaves):
            return None
        return jnp.concatenate([jnp.asarray(x) for x in leaves], axis=0)

    return jax.tree_util.tree_map(stack, *items, is_leaf=lambda x: x is None)


def to_numpy(tree: Any) -> Any:
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree, is_leaf=lambda x: x is None)


def to_device(tree: Any, device=None, min_size: int = 1024) -> Any:
    """Stage a frame's LARGE arrays (images, flow, depth) onto the device.

    Small calibration leaves (K, T_BS, baseline, time_ns, poses) stay host
    numpy: the per-frame driver reads them on the host (push_keyframe, trace
    metadata), and on a remote-tunnel TPU every dependent device->host read
    of a fresh buffer costs a full link round trip (~37 ms measured) — far
    more than the upload saved.
    """

    def put(x):
        if x is None:
            return None
        arr = np.asarray(x)
        if arr.size < min_size:
            return arr
        return jax.device_put(jnp.asarray(arr), device)

    return jax.tree_util.tree_map(put, tree, is_leaf=lambda x: x is None)
