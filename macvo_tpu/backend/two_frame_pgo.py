"""Two-frame pose-graph optimizers (reference: Module/Optimization/TwoFramePGO/).

``TwoFrame_PGO`` optimizes the newest keyframe's pose against the previous
frame's world points using one of three residual graphs (icp / reproj / disp,
see backend/solver.py). ``Local_TwoFrame_PGO`` re-anchors the problem in the
previous keyframe's frame for numerical stability (reference:
Optimizer.py:111-150) — this is what makes float32 viable on TPU.
``Empty_TwoFrame_PGO`` is the no-op debugging variant.

Observations are padded to a static ``capacity`` so every frame reuses one
compiled solve (no recompiles, shapes never change).
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry import camera, se3
from ..utils import timer
from ..worldmap import VisualMap
from .interface import IOptimizer
from .solver import TwoFrameData, solve_two_frame


@dataclasses.dataclass
class GraphInput:
    """(reference: TwoFramePGO/Graphs.py:11-21)"""

    frame_idx: int
    from_idx: int
    data: TwoFrameData


@dataclasses.dataclass
class GraphOutput:
    """(reference: TwoFramePGO/Graphs.py:24-28)"""

    frame_idx: int
    from_idx: int
    pose: jnp.ndarray  # (7,) — still device-async until write_graph_data


class TwoFrame_PGO(IOptimizer[GraphInput, GraphOutput]):
    DEFAULT_CAPACITY = 512

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.capacity = int(getattr(config, "capacity", self.DEFAULT_CAPACITY))
        self.dtype = jnp.float64 if getattr(config, "use_fp64", False) else jnp.float32

    @staticmethod
    def init_context(config: SimpleNamespace) -> Any:
        return {"graph_type": config.graph_type}

    def get_graph_data(self, global_map: VisualMap, frame_idx: int) -> GraphInput:
        """Pull the newest frame's matches/points from the map and pad to the
        static capacity (reference: Optimizer.py:24-38)."""
        frame = global_map.frames[frame_idx]
        obs = global_map.get_frame2match(frame)
        pts = global_map.get_match2point(obs)

        n = len(obs)
        cap = self.capacity
        if n > cap:
            raise ValueError(f"TwoFrame_PGO: {n} observations exceed capacity {cap}")

        def pad(arr: np.ndarray, fill: float = 0.0) -> np.ndarray:
            out = np.full((cap,) + arr.shape[1:], fill, dtype=np.float64)
            out[:n] = arr
            return out

        K = frame.data["K"][0].astype(np.float64)
        kp2 = obs.data["pixel2_uv"].astype(np.float64)
        d2 = obs.data["pixel2_d"][:, 0].astype(np.float64)
        # NED backprojection in host numpy — building the problem is pure
        # bookkeeping; the device sees ONE device_put of the whole block.
        y = (kp2[:, 0] - K[0, 2]) * d2 / K[0, 0]
        z = (kp2[:, 1] - K[1, 2]) * d2 / K[1, 1]
        points_c = np.stack([d2, y, z], axis=1)
        cov_kp2 = np.zeros((n, 2, 2))
        cov_kp2[:, 0, 0] = obs.data["pixel2_uv_cov"][:, 0]
        cov_kp2[:, 1, 1] = obs.data["pixel2_uv_cov"][:, 1]
        cov_kp2[:, 0, 1] = obs.data["pixel2_uv_cov"][:, 2]
        cov_kp2[:, 1, 0] = obs.data["pixel2_uv_cov"][:, 2]

        mask = np.zeros((cap,), dtype=bool)
        mask[:n] = True
        np_dt = np.float64 if self.dtype == jnp.float64 else np.float32
        data_host = TwoFrameData(
            pose0=frame.data["pose"][0].astype(np_dt),
            points_w=pad(pts.data["pos_Tw"]).astype(np_dt),
            points_c=pad(points_c).astype(np_dt),
            kp2=pad(kp2).astype(np_dt),
            disp2=pad(obs.data["pixel2_disp"][:, 0], fill=1.0).astype(np_dt),
            cov_obs_c=pad(obs.data["obs2_covTc"]).astype(np_dt),
            cov_pts_w=pad(pts.data["cov_Tw"]).astype(np_dt),
            cov_kp2=pad(cov_kp2).astype(np_dt),
            disp2_cov=pad(obs.data["pixel2_disp_cov"][:, 0], fill=1.0).astype(np_dt),
            K=K.astype(np_dt),
            baseline=np.asarray(frame.data["baseline"][0], np_dt),
            mask=mask,
        )
        data = jax.device_put(data_host)
        return GraphInput(frame_idx=frame_idx, from_idx=frame_idx - 1, data=data)

    def _optimize(self, context: Any, graph_data: GraphInput) -> tuple[Any, GraphOutput]:
        with timer.cpu_time("TwoframePGO.dispatch"):
            pose = solve_two_frame(graph_data.data, graph_type=context["graph_type"])
        return context, GraphOutput(
            frame_idx=graph_data.frame_idx, from_idx=graph_data.from_idx, pose=pose
        )

    def write_graph_data(self, result: Optional[GraphOutput], global_map: VisualMap) -> None:
        if result is None:
            return
        global_map.frames.data["pose"][result.frame_idx] = np.asarray(
            result.pose, dtype=np.float32
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "graph_type": lambda s: s in {"icp", "reproj", "disp"},
            "parallel": lambda b: isinstance(b, bool),
        })


class Local_TwoFrame_PGO(TwoFrame_PGO):
    """Re-anchor the solve in the previous keyframe's frame
    (reference: Optimizer.py:111-150): points and covariances are transformed
    by T_w2o before the solve and the result is mapped back — keeps the
    problem well-conditioned in km-scale scenes and makes f32 sufficient."""

    def get_graph_data(self, global_map: VisualMap, frame_idx: int) -> GraphInput:
        gi = super().get_graph_data(global_map, frame_idx)
        anchor = jnp.asarray(
            global_map.frames.data["pose"][frame_idx - 1], self.dtype
        )
        self._T_o2w = anchor
        T_w2o = se3.inv(anchor)
        R = se3.rotmat(T_w2o)
        d = gi.data
        gi.data = d._replace(
            pose0=se3.mul(T_w2o, d.pose0),
            points_w=se3.act(T_w2o, d.points_w),
            cov_pts_w=jnp.einsum("ij,njk,lk->nil", R, d.cov_pts_w, R),
        )
        return gi

    def _optimize(self, context: Any, graph_data: GraphInput) -> tuple[Any, GraphOutput]:
        context, out = super()._optimize(context, graph_data)
        out.pose = se3.normalize(se3.mul(self._T_o2w, out.pose))
        return context, out


class Empty_TwoFrame_PGO(TwoFrame_PGO):
    """No-op optimizer for debugging (reference: Optimizer.py:153-161)."""

    def _optimize(self, context: Any, graph_data: GraphInput) -> tuple[Any, GraphOutput]:
        return context, GraphOutput(
            frame_idx=graph_data.frame_idx,
            from_idx=graph_data.from_idx,
            pose=graph_data.data.pose0,
        )
