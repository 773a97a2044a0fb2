"""rerun 3D streaming visualizer (reference: Utility/Visualize/Rerun_Visualize.py:25-163).

Trajectory linestrips, pinhole cameras, images, and map points with
covariance rendered as determinant-scaled radii. The rerun sdk is optional in
this image — every entry point no-ops (with one warning) when it is absent.
"""

from __future__ import annotations

import numpy as np

from ..utils.logging import Logger
from .interface import has_rerun

_WARNED = False


def _rr():
    global _WARNED
    if not has_rerun():
        if not _WARNED:
            Logger.warning("rerun-sdk not installed; 3D visualization disabled")
            _WARNED = True
        return None
    import rerun

    return rerun


def init(app_name: str = "macvo_tpu", spawn: bool = False) -> bool:
    rr = _rr()
    if rr is None:
        return False
    rr.init(app_name, spawn=spawn)
    return True


def log_trajectory(path: str, positions: np.ndarray, color=(70, 130, 255)) -> None:
    rr = _rr()
    if rr is None:
        return
    rr.log(path, rr.LineStrips3D([positions.astype(np.float32)], colors=[color]))


def log_camera(path: str, pose7: np.ndarray, K: np.ndarray, width: int, height: int) -> None:
    rr = _rr()
    if rr is None:
        return
    rr.log(path, rr.Transform3D(
        translation=pose7[:3].astype(np.float32),
        rotation=rr.Quaternion(xyzw=pose7[3:7].astype(np.float32)),
    ))
    rr.log(f"{path}/pinhole", rr.Pinhole(
        image_from_camera=K.astype(np.float32), width=width, height=height,
    ))


def log_image(path: str, image: np.ndarray) -> None:
    rr = _rr()
    if rr is None:
        return
    rr.log(path, rr.Image((image * 255).astype(np.uint8)))


def log_points(path: str, positions: np.ndarray, colors: np.ndarray | None = None,
               covariances: np.ndarray | None = None) -> None:
    """Map points; covariance shown as det^(1/6)-scaled radii (the reference's
    det-sphere mode, Rerun_Visualize.py:96-130)."""
    rr = _rr()
    if rr is None:
        return
    radii = None
    if covariances is not None:
        det = np.clip(np.linalg.det(covariances.astype(np.float64)), 1e-12, None)
        radii = (det ** (1.0 / 6.0)).astype(np.float32) * 0.5
    rr.log(path, rr.Points3D(
        positions.astype(np.float32), colors=colors, radii=radii,
    ))
