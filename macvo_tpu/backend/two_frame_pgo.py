"""Two-frame pose-graph optimizers (reference: Module/Optimization/TwoFramePGO/).

``TwoFrame_PGO`` optimizes the newest keyframe's pose against the previous
frame's world points using one of three residual graphs (icp / reproj / disp,
see backend/solver.py). ``Local_TwoFrame_PGO`` re-anchors the problem in the
previous keyframe's frame for numerical stability (reference:
Optimizer.py:111-150) — this is what makes float32 viable on TPU.
``Empty_TwoFrame_PGO`` is the no-op debugging variant.

Transport discipline: the whole problem is assembled host-side into ONE
packed array (solver.pack_two_frame) — a single upload — and the solve is a
single async dispatch; the optimized pose is either fetched by ``write_map``
(one tiny download) or consumed device-side by the orchestrator's fused
pipeline via ``pending_pose`` (zero downloads, see odometry/macvo.py).
Observations are padded to a static ``capacity`` so every frame reuses one
compiled solve.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from types import SimpleNamespace
from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import timer
from ..utils.precision import matmul_highest
from ..worldmap import VisualMap
from .interface import IOptimizer
from .solver import pack_two_frame, solve_two_frame_packed


# -- small host-side SE3 helpers (numpy; avoids device dispatches for
#    problem assembly) -----------------------------------------------------------

@jax.jit
def _anchored_pose(anchor: jnp.ndarray, local_pose: jnp.ndarray) -> jnp.ndarray:
    from ..geometry import se3

    return se3.normalize(se3.mul(anchor, local_pose))


@partial(jax.jit, static_argnames=("graph_type",))
@matmul_highest
def solve_sync_packed(sync: jnp.ndarray, anchor: jnp.ndarray, cam: jnp.ndarray,
                      baseline: jnp.ndarray, graph_type: str) -> jnp.ndarray:
    """Device-chained two-frame solve: consume the odometry pipeline's packed
    sync array DIRECTLY on device — the LM problem never touches the host.

    The reference pipelines the backend behind a process boundary
    (Module/Optimization/Interface.py:80-96); the round-1 port pipelined it
    behind XLA async dispatch but still assembled the problem from the HOST
    map, which put one device->host round trip on the critical path — ~90 ms
    on a remote-attached TPU, dwarfing the ~40 ms of device compute. Here the
    (K+1, 52) sync array (odometry/layout.py) IS the problem: world landmarks
    re-anchor to the previous keyframe's frame (Local_TwoFrame_PGO semantics —
    the anchor transform reduces to using the frame-0 camera-frame
    backprojection and obs1 covariance directly), the masked solve runs
    in-trace, and lost-track (< MIN_NUM_POINT survivors) returns the motion
    prediction, exactly like the host path (Odometry/MACVO.py:300-311).

    ``cam`` = (fx, fy, cx, cy). Returns the WORLD pose of the new frame.
    """
    from ..geometry import camera, se3
    from ..odometry.layout import COL_KEEP, MIN_NUM_POINT, OBS_COLS
    from .solver import TwoFrameData, solve_two_frame

    k = sync.shape[0] - 1
    rows, aux = sync[:k], sync[k]
    est_pose = aux[0:7]

    def col(name):
        lo, hi = OBS_COLS[name]
        return rows[:, lo:hi]

    fx, fy, cx, cy = cam[0], cam[1], cam[2], cam[3]
    zero = jnp.zeros((), sync.dtype)
    one = jnp.ones((), sync.dtype)
    K = jnp.stack([
        jnp.stack([fx, zero, cx]), jnp.stack([zero, fy, cy]),
        jnp.stack([zero, zero, one]),
    ])
    keep = rows[:, COL_KEEP] > 0.5

    # Masked-out rows can carry frontend NaN/Inf (bf16 overflow in pixel or
    # depth columns); NaN*0 = NaN would poison the masked loss reductions and
    # silently freeze the pose to the motion prediction — the same failure
    # class unpack_two_frame guards against (solver.py:183-189). Substitute
    # benign values before any residual math.
    def clean(x, benign):
        k2 = keep if x.ndim == 1 else keep[:, None]
        return jnp.where(k2, jnp.nan_to_num(x, nan=benign, posinf=benign, neginf=benign), benign)

    uv1 = clean(col("pixel1_uv"), 0.0)
    uv2 = clean(col("pixel2_uv"), 0.0)
    d1 = clean(col("pixel1_d")[:, 0], 1.0)
    d2 = clean(col("pixel2_d")[:, 0], 1.0)
    disp2 = clean(col("pixel2_disp")[:, 0], 1.0)

    # Local re-anchoring in the previous keyframe's camera frame: the world
    # landmark pos0_Tw = anchor . backproject(pixel1) and cov0_Tw =
    # R cov_c R^T, so inv(anchor)-transforming them is just the camera-frame
    # quantities — no transform needed at all.
    pts_local = camera.pixel_to_point_ned(uv1, d1, K)
    pts_c1 = camera.pixel_to_point_ned(uv2, d2, K)
    uvc = col("pixel2_uv_cov")  # (sigma_uu, sigma_vv, sigma_uv)
    cov_kp2 = jnp.stack([
        jnp.stack([uvc[:, 0], uvc[:, 2]], -1),
        jnp.stack([uvc[:, 2], uvc[:, 1]], -1),
    ], -2)
    data = TwoFrameData(
        pose0=se3.mul(se3.inv(anchor), est_pose).astype(sync.dtype),
        points_w=pts_local,
        points_c=pts_c1,
        kp2=uv2,
        disp2=disp2,
        cov_obs_c=col("obs2_covTc").reshape(k, 3, 3),
        cov_pts_w=col("obs1_covTc").reshape(k, 3, 3),
        cov_kp2=cov_kp2,
        disp2_cov=col("pixel2_disp_cov")[:, 0],
        K=K,
        baseline=baseline,
        mask=keep,
    )
    pose_local = solve_two_frame(data, graph_type=graph_type)
    pose_w = se3.normalize(se3.mul(anchor, pose_local))
    lost = keep.sum() < MIN_NUM_POINT
    return jnp.where(lost, se3.normalize(est_pose), pose_w)


def _np_quat_rotmat(q: np.ndarray) -> np.ndarray:
    x, y, z, w = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def _np_pose_inv(pose: np.ndarray) -> np.ndarray:
    q_inv = pose[3:7] * np.array([-1.0, -1.0, -1.0, 1.0])
    t_inv = -_np_quat_rotmat(q_inv) @ pose[:3]
    return np.concatenate([t_inv, q_inv])


def _np_pose_mul(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x1, y1, z1, w1 = a[3:7]
    x2, y2, z2, w2 = b[3:7]
    q = np.array([
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
    ])
    q /= max(np.linalg.norm(q), 1e-12)
    t = a[:3] + _np_quat_rotmat(a[3:7]) @ b[:3]
    return np.concatenate([t, q])


@dataclasses.dataclass
class GraphInput:
    """(reference: TwoFramePGO/Graphs.py:11-21) — packed transport form."""

    frame_idx: int
    from_idx: int
    packed: np.ndarray           # (cap+1, 33) host array, see solver.pack_two_frame


@dataclasses.dataclass
class GraphOutput:
    """(reference: TwoFramePGO/Graphs.py:24-28)"""

    frame_idx: int
    from_idx: int
    pose: jnp.ndarray  # (7,) — still device-async until fetched


class TwoFrame_PGO(IOptimizer[GraphInput, GraphOutput]):
    DEFAULT_CAPACITY = 512

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.capacity = int(getattr(config, "capacity", self.DEFAULT_CAPACITY))
        self.np_dtype = np.float64 if getattr(config, "use_fp64", False) else np.float32

    @staticmethod
    def init_context(config: SimpleNamespace) -> Any:
        return {"graph_type": config.graph_type}

    def _assemble(self, global_map: VisualMap, frame_idx: int) -> np.ndarray:
        """Pull the newest frame's matches/points from the map into the packed
        problem array (reference: Optimizer.py:24-38)."""
        frame = global_map.frames[frame_idx]
        obs = global_map.get_frame2match(frame)
        pts = global_map.get_match2point(obs)

        n = len(obs)
        cap = self.capacity
        if n > cap:
            raise ValueError(f"TwoFrame_PGO: {n} observations exceed capacity {cap}")

        dt = self.np_dtype
        packed = np.zeros((cap + 1, 33), dtype=dt)
        K = frame.data["K"][0].astype(np.float64)
        kp2 = obs.data["pixel2_uv"].astype(np.float64)
        d2 = obs.data["pixel2_d"][:, 0].astype(np.float64)
        # NED backprojection of frame-1 observations (host).
        packed[:n, 3] = d2
        packed[:n, 4] = (kp2[:, 0] - K[0, 2]) * d2 / K[0, 0]
        packed[:n, 5] = (kp2[:, 1] - K[1, 2]) * d2 / K[1, 1]
        packed[:n, 0:3] = pts.data["pos_Tw"]
        packed[:n, 6:8] = kp2
        packed[:n, 8] = obs.data["pixel2_disp"][:, 0]
        packed[:n, 9:18] = obs.data["obs2_covTc"].reshape(n, 9)
        packed[:n, 18:27] = pts.data["cov_Tw"].reshape(n, 9)
        uv_cov = obs.data["pixel2_uv_cov"]
        packed[:n, 27] = uv_cov[:, 0]
        packed[:n, 28] = uv_cov[:, 2]
        packed[:n, 29] = uv_cov[:, 2]
        packed[:n, 30] = uv_cov[:, 1]
        packed[:n, 31] = obs.data["pixel2_disp_cov"][:, 0]
        packed[n:cap, 8] = 1.0      # harmless disparity for padded rows
        packed[n:cap, 31] = 1.0
        packed[:n, 32] = 1.0        # validity mask
        packed[cap, 0:7] = frame.data["pose"][0]
        packed[cap, 7:11] = (K[0, 0], K[1, 1], K[0, 2], K[1, 2])
        packed[cap, 11] = frame.data["baseline"][0]
        return packed

    def get_graph_data(self, global_map: VisualMap, frame_idx: int) -> GraphInput:
        return GraphInput(
            frame_idx=frame_idx, from_idx=frame_idx - 1,
            packed=self._assemble(global_map, frame_idx),
        )

    def _optimize(self, context: Any, graph_data: GraphInput) -> tuple[Any, GraphOutput]:
        with timer.cpu_time("TwoframePGO.dispatch"):
            pose = solve_two_frame_packed(
                graph_data.packed, graph_type=context["graph_type"]
            )
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
    problem well-conditioned in km-scale scenes and makes f32 sufficient.
    All re-anchoring math is host numpy (the packed array is host-side).

    Also supports DEVICE CHAINING (``start_optimize_device``): the odometry
    loop hands the solve its device-resident packed sync array and anchor
    pose, so the backend runs with ZERO host round trips on the critical
    path (see ``solve_sync_packed``)."""

    supports_device_chaining = True

    def start_optimize_device(self, sync_packed: jnp.ndarray, anchor: jnp.ndarray,
                              cam: jnp.ndarray, baseline: jnp.ndarray,
                              frame_idx: int) -> None:
        """Dispatch the solve straight from the pipeline's device arrays.
        Returns immediately; the pose stays a device handle until consumed
        (take_pending for the next frame's registration, write_map at
        termination)."""
        assert self._pending is None, "start_optimize called while a job is pending"
        pose = solve_sync_packed(
            sync_packed, anchor, cam, baseline, self.context["graph_type"]
        )
        self._pending = GraphOutput(
            frame_idx=frame_idx, from_idx=frame_idx - 1, pose=pose
        )

    def get_graph_data(self, global_map: VisualMap, frame_idx: int) -> GraphInput:
        gi = super().get_graph_data(global_map, frame_idx)
        anchor = global_map.frames.data["pose"][frame_idx - 1].astype(np.float64)
        self._T_o2w = anchor
        T_w2o = _np_pose_inv(anchor)
        R = _np_quat_rotmat(T_w2o[3:7])

        cap = self.capacity
        p = gi.packed
        pts_w = p[:cap, 0:3].astype(np.float64)
        p[:cap, 0:3] = (pts_w @ R.T + T_w2o[:3]) * p[:cap, 32:33]
        covs = p[:cap, 18:27].reshape(cap, 3, 3).astype(np.float64)
        p[:cap, 18:27] = np.einsum("ij,njk,lk->nil", R, covs, R).reshape(cap, 9)
        p[cap, 0:7] = _np_pose_mul(T_w2o, p[cap, 0:7].astype(np.float64))
        return gi

    def _optimize(self, context: Any, graph_data: GraphInput) -> tuple[Any, GraphOutput]:
        context, out = super()._optimize(context, graph_data)
        # Map the local-frame solution back to world: ONE jitted dispatch.
        # (Eagerly, se3.mul + normalize are ~20 primitives = ~20 RPCs per
        # frame on a remote-attached TPU — measurable against the whole
        # frame budget.)
        # Follow the solver's dtype (jit re-specializes per dtype): with
        # use_fp64 the world-frame re-composition must stay f64 — large-
        # coordinate scenes lose real precision in f32.
        anchor = jnp.asarray(self._T_o2w, out.pose.dtype)
        out.pose = _anchored_pose(anchor, out.pose)
        return context, out


class Empty_TwoFrame_PGO(TwoFrame_PGO):
    """No-op optimizer for debugging (reference: Optimizer.py:153-161)."""

    def _optimize(self, context: Any, graph_data: GraphInput) -> tuple[Any, GraphOutput]:
        cap = graph_data.packed.shape[0] - 1
        return context, GraphOutput(
            frame_idx=graph_data.frame_idx,
            from_idx=graph_data.from_idx,
            pose=jnp.asarray(graph_data.packed[cap, 0:7], jnp.float32),
        )
