"""Jitted Levenberg-Marquardt solver for the two-frame pose-graph problems.

TPU-native rebuild of the reference's PyPose LM stack
(Module/Optimization/PyposeOptimizers.py:136-194 ``LM_analytic.step`` and
TwoFramePGO/Optimizer.py:81-102): Huber robust kernel via IRLS/Triggs
whitening, damped normal equations with diagonal clamping, accept/reject
trust-region damping (<=16 rejects per step), outer loop of <=10 steps with a
plateau stop (patience 2, decreasing 1e-5) — all inside ``lax.while_loop`` so
the whole solve is ONE device program instead of the reference's per-step
host round-trips and block-diag ``pinverse``.

Design differences (deliberate, TPU-first):
* The pose is optimized in the se3 tangent space with right-multiplicative
  retraction ``T(delta) = T0 * Exp(delta)`` — 6 true DOF instead of pypose's
  7-dim quaternion parameter, so A is 6x6 SPD and needs no pseudo-inverse.
* Per-observation covariances are whitened block-wise (one 3x3 inverse per
  observation, batched) instead of materializing the reference's
  (3N x 3N) block-diagonal weight matrix.
* Observations carry a validity mask; padded rows get zero weight, keeping
  shapes static across frames (no recompiles).
* dtype follows the inputs: run f64 on CPU for reference-grade accuracy, or
  f32 on TPU together with local-frame re-anchoring (see Local_TwoFrame_PGO).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..geometry import se3
from ..utils.precision import matmul_highest


class TwoFrameData(NamedTuple):
    """Static-shape observation block for one two-frame solve (padded to N)."""

    pose0: jnp.ndarray        # (7,) initial pose of the frame to optimize
    points_w: jnp.ndarray     # (N,3) world-frame 3D points (frame-0 backprojections)
    points_c: jnp.ndarray     # (N,3) camera-frame points of frame 1 (ICP target)
    kp2: jnp.ndarray          # (N,2) observed pixels on frame 1
    disp2: jnp.ndarray        # (N,) observed disparity on frame 1
    cov_obs_c: jnp.ndarray    # (N,3,3) frame-1 observation cov (camera frame)
    cov_pts_w: jnp.ndarray    # (N,3,3) world point cov
    cov_kp2: jnp.ndarray      # (N,2,2) pixel cov of kp2
    disp2_cov: jnp.ndarray    # (N,) disparity variance
    K: jnp.ndarray            # (3,3)
    baseline: jnp.ndarray     # () scalar
    mask: jnp.ndarray         # (N,) bool validity


def _safe_x(x: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """Sign-preserving clamp away from zero: one degenerate landmark (x ~ 0,
    on/behind the image plane) must yield a large-but-finite residual the
    Huber kernel can downweight, never a NaN that poisons the reductions."""
    return jnp.where(jnp.abs(x) < eps, jnp.where(x < 0, -eps, eps), x)


def _project_ned(points: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = _safe_x(points[..., 0])
    u = fx * points[..., 1] / x + cx
    v = fy * points[..., 2] / x + cy
    return jnp.stack([u, v], axis=-1)


def _pinhole_jacobian(q: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """d(pi)/dq for NED pinhole, (N,2,3) (reference: Graphs.py:176-190)."""
    fx, fy = K[0, 0], K[1, 1]
    x, y, z = _safe_x(q[..., 0]), q[..., 1], q[..., 2]
    x2 = jnp.square(x)
    zero = jnp.zeros_like(x)
    row_u = jnp.stack([-fx * y / x2, fx / x, zero], axis=-1)
    row_v = jnp.stack([-fy * z / x2, zero, fy / x], axis=-1)
    return jnp.stack([row_u, row_v], axis=-2)


# -- residual + Jacobian per graph type -----------------------------------------
# All return (residual (N,D), jacobian (N,D,6), cov (N,D,D)).

def _icp_terms(pose, data: TwoFrameData):
    """r = T p_c - p_w; Sigma = R Sigma_obs R^T + Sigma_pt
    (reference: Graphs.py:33-73,151-168 — Jacobian re-derived for the
    right-multiplicative se3 retraction: J = [R | -R skew(p_c)])."""
    R = se3.rotmat(pose)
    p_w_pred = se3.act(pose, data.points_c)
    r = p_w_pred - data.points_w
    J_rho = jnp.broadcast_to(R, data.points_c.shape[:-1] + (3, 3))
    J_phi = -jnp.einsum("ij,njk->nik", R, se3.skew(data.points_c))
    J = jnp.concatenate([J_rho, J_phi], axis=-1)
    cov = jnp.einsum("ij,njk,lk->nil", R, data.cov_obs_c, R) + data.cov_pts_w.astype(R.dtype)
    return r, J, cov


def _reproj_q_jacobian(pose, points_w):
    """q = T^-1 p_w and dq/ddelta = [-R^T | R^T skew(p_w)] ... for the right
    retraction: q(delta) = Exp(-delta) T0^-1 p_w => dq = [-I | skew(q0)]."""
    q = se3.act(se3.inv(pose), points_w)
    J_rho = -jnp.broadcast_to(jnp.eye(3, dtype=q.dtype), q.shape[:-1] + (3, 3))
    J_phi = se3.skew(q)
    return q, jnp.concatenate([J_rho, J_phi], axis=-1)


def _reproj_terms(pose, data: TwoFrameData):
    """r = pi(T^-1 p_w) - kp2 (reference: Graphs.py:76-118,170-198)."""
    q, J_q = _reproj_q_jacobian(pose, data.points_w)
    r = _project_ned(q, data.K) - data.kp2
    J = jnp.einsum("nij,njk->nik", _pinhole_jacobian(q, data.K), J_q)
    return r, J, data.cov_kp2


def _reproj_disp_terms(pose, data: TwoFrameData):
    """r = [reproj_u, reproj_v, fx*bl/x - disp2] — the shipping ``disp`` graph
    (reference: Graphs.py:121-148,201-231)."""
    q, J_q = _reproj_q_jacobian(pose, data.points_w)
    fx = data.K[0, 0]
    reproj = _project_ned(q, data.K) - data.kp2
    disp_r = fx * data.baseline / _safe_x(q[..., 0]) - data.disp2
    r = jnp.concatenate([reproj, disp_r[..., None]], axis=-1)

    J_reproj = jnp.einsum("nij,njk->nik", _pinhole_jacobian(q, data.K), J_q)
    d_disp_dx = -(fx * data.baseline) / jnp.square(_safe_x(q[..., 0]))
    J_disp = d_disp_dx[..., None, None] * J_q[..., 0:1, :]
    J = jnp.concatenate([J_reproj, J_disp], axis=-2)

    n = data.kp2.shape[0]
    cov = jnp.zeros((n, 3, 3), dtype=data.cov_kp2.dtype)
    cov = cov.at[:, :2, :2].set(data.cov_kp2)
    cov = cov.at[:, 2, 2].set(data.disp2_cov)
    return r, J, cov


_GRAPH_TERMS = {"icp": _icp_terms, "reproj": _reproj_terms, "disp": _reproj_disp_terms}


# -- packed transport ------------------------------------------------------------
# One flat (cap+1, 33) array carries the whole problem to the device in a
# SINGLE transfer (a tuple of 13 arrays costs 13 link round-trips on a remote
# TPU). Columns: points_w 0:3 | points_c 3:6 | kp2 6:8 | disp2 8 |
# cov_obs_c 9:18 | cov_pts_w 18:27 | cov_kp2 27:31 | disp2_cov 31 | mask 32.
# The extra LAST row holds the scalars: pose0 0:7 | fx fy cx cy 7:11 | bl 11.
PACKED_WIDTH = 33


def pack_two_frame(data) -> "jnp.ndarray":
    """Host-side: TwoFrameData (numpy leaves) -> (cap+1, 33) float array."""
    import numpy as np

    cap = data.mask.shape[0]
    out = np.zeros((cap + 1, PACKED_WIDTH), dtype=np.asarray(data.points_w).dtype)
    out[:cap, 0:3] = data.points_w
    out[:cap, 3:6] = data.points_c
    out[:cap, 6:8] = data.kp2
    out[:cap, 8] = data.disp2
    out[:cap, 9:18] = np.asarray(data.cov_obs_c).reshape(cap, 9)
    out[:cap, 18:27] = np.asarray(data.cov_pts_w).reshape(cap, 9)
    out[:cap, 27:31] = np.asarray(data.cov_kp2).reshape(cap, 4)
    out[:cap, 31] = data.disp2_cov
    out[:cap, 32] = np.asarray(data.mask, dtype=out.dtype)
    K = np.asarray(data.K)
    out[cap, 0:7] = data.pose0
    out[cap, 7:11] = (K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    out[cap, 11] = data.baseline
    return out


def unpack_two_frame(packed: jnp.ndarray) -> TwoFrameData:
    """Traced: (cap+1, 33) -> TwoFrameData."""
    cap = packed.shape[0] - 1
    aux = packed[cap]
    fx, fy, cx, cy = aux[7], aux[8], aux[9], aux[10]
    zero = jnp.zeros((), packed.dtype)
    one = jnp.ones((), packed.dtype)
    K = jnp.stack([
        jnp.stack([fx, zero, cx]), jnp.stack([zero, fy, cy]),
        jnp.stack([zero, zero, one]),
    ])
    mask = packed[:cap, 32] > 0.5
    # Padded rows carry zeros; a zero world point projects through x=0 and
    # the resulting NaN defeats the mask (NaN * 0 = NaN poisons every
    # reduction — with an identity init, as in the Local re-anchored solve,
    # this silently froze the pose). Give padded rows a benign point at
    # unit depth instead.
    benign = jnp.asarray([1.0, 0.0, 0.0], packed.dtype)
    points_w = jnp.where(mask[:, None], packed[:cap, 0:3], benign)
    points_c = jnp.where(mask[:, None], packed[:cap, 3:6], benign)
    return TwoFrameData(
        pose0=aux[0:7],
        points_w=points_w,
        points_c=points_c,
        kp2=packed[:cap, 6:8],
        disp2=packed[:cap, 8],
        cov_obs_c=packed[:cap, 9:18].reshape(cap, 3, 3),
        cov_pts_w=packed[:cap, 18:27].reshape(cap, 3, 3),
        cov_kp2=packed[:cap, 27:31].reshape(cap, 2, 2),
        disp2_cov=packed[:cap, 31],
        K=K,
        baseline=aux[11],
        mask=mask,
    )


@partial(jax.jit, static_argnames=("graph_type",))
def solve_two_frame_packed(packed: jnp.ndarray, graph_type: str = "icp") -> jnp.ndarray:
    """Single-upload entry: unpack + solve in one jit."""
    return solve_two_frame(unpack_two_frame(packed), graph_type=graph_type)


def _block_whiten(cov: jnp.ndarray, mask: jnp.ndarray, ridge: float = 1e-12) -> jnp.ndarray:
    """Per-observation inverse covariance; masked rows get zero weight.

    Replaces the reference's ``torch.block_diag(pinverse(...))``
    (TwoFramePGO/Optimizer.py:94-97) with a batched small-matrix inverse.
    """
    d = cov.shape[-1]
    eye = jnp.eye(d, dtype=cov.dtype)
    safe = jnp.where(mask[:, None, None], cov, eye) + ridge * eye
    w = jnp.linalg.inv(safe)
    return jnp.where(mask[:, None, None], w, 0.0)


class _LMState(NamedTuple):
    twist: jnp.ndarray       # (6,) accumulated tangent update
    loss: jnp.ndarray        # scalar current robust loss
    damping: jnp.ndarray     # scalar LM damping
    step: jnp.ndarray        # outer-step counter
    plateau: jnp.ndarray     # consecutive non-decreasing steps
    done: jnp.ndarray        # bool


@partial(jax.jit, static_argnames=("graph_type", "max_steps", "max_rejects", "axis_name"))
@matmul_highest
def solve_two_frame(
    data: TwoFrameData,
    graph_type: str = "icp",
    huber_delta: float = 0.1,
    damping_init: float = 1e-3,
    damping_up: float = 4.0,
    damping_down: float = 0.5,
    damping_min: float = 1e-9,
    damping_max: float = 1e10,
    diag_min: float = 1e-6,
    diag_max: float = 1e32,
    plateau_decreasing: float = 1e-5,
    plateau_patience: int = 2,
    max_steps: int = 10,
    max_rejects: int = 16,
    axis_name: str | None = None,
) -> jnp.ndarray:
    """Run the damped LM solve; returns the optimized (7,) SE3 pose.

    The robust kernel matches the reference stack: Huber(delta=0.1) with
    Triggs-style IRLS weights on the whitened residual norm.

    ``axis_name``: when set, the solve runs SPMD inside a ``shard_map`` with
    the observation axis sharded across devices — the per-device partial
    Hessian/gradient/loss contributions are ``psum``'d over ICI, after which
    every device runs the identical 6x6 LM update (the distributed-BA
    pattern, SURVEY.md §7 M8). The N-dim arrays of ``data`` then hold this
    device's shard.
    """
    terms_fn = _GRAPH_TERMS[graph_type]
    dtype = data.points_w.dtype
    mask_f = data.mask.astype(dtype)

    def _reduce(x):
        return lax.psum(x, axis_name) if axis_name is not None else x

    def robustified_system(twist):
        pose = se3.mul(data.pose0, se3.exp(twist))
        r, J, cov = terms_fn(pose, data)
        W = _block_whiten(cov, data.mask)
        # Whitened squared norm per observation and Huber IRLS weight.
        sq = jnp.einsum("ni,nij,nj->n", r, W, r)
        sq = jnp.maximum(sq, 0.0)
        e = jnp.sqrt(sq + 1e-24)
        w_huber = jnp.where(e <= huber_delta, 1.0, huber_delta / e)
        # Robust loss (Huber rho on the whitened norm), masked.
        rho = jnp.where(
            e <= huber_delta, sq, 2.0 * huber_delta * e - huber_delta**2
        )
        loss = _reduce(jnp.sum(rho * mask_f))
        Weff = W * (w_huber * mask_f)[:, None, None]
        A = _reduce(jnp.einsum("ndi,ndk,nkj->ij", J, Weff, J))
        b = _reduce(-jnp.einsum("ndi,ndk,nk->i", J, Weff, r))
        return loss, A, b

    def loss_only(twist):
        pose = se3.mul(data.pose0, se3.exp(twist))
        r, _, cov = terms_fn(pose, data)
        W = _block_whiten(cov, data.mask)
        sq = jnp.maximum(jnp.einsum("ni,nij,nj->n", r, W, r), 0.0)
        e = jnp.sqrt(sq + 1e-24)
        rho = jnp.where(e <= huber_delta, sq, 2.0 * huber_delta * e - huber_delta**2)
        return _reduce(jnp.sum(rho * mask_f))

    init_loss = loss_only(jnp.zeros((6,), dtype))
    init = _LMState(
        twist=jnp.zeros((6,), dtype),
        loss=init_loss,
        damping=jnp.asarray(damping_init, dtype),
        step=jnp.asarray(0, jnp.int32),
        plateau=jnp.asarray(0, jnp.int32),
        done=jnp.asarray(False),
    )

    def outer_cond(state: _LMState):
        return (state.step < max_steps) & ~state.done

    def outer_body(state: _LMState):
        last_loss, A, b = robustified_system(state.twist)
        diag = jnp.clip(jnp.diagonal(A), diag_min, diag_max)
        A = A.at[jnp.arange(6), jnp.arange(6)].set(diag)

        def try_cond(carry):
            _, _, accepted, rejects, _ = carry
            return ~accepted & (rejects <= max_rejects)

        def try_body(carry):
            twist, damping, _, rejects, _ = carry
            A_damped = A.at[jnp.arange(6), jnp.arange(6)].add(diag * damping)
            delta = jnp.linalg.solve(A_damped, b)
            cand = se3.log(se3.mul(se3.exp(twist), se3.exp(delta)))
            cand_loss = loss_only(cand)
            accept = cand_loss < last_loss
            new_twist = jnp.where(accept, cand, twist)
            new_damping = jnp.where(
                accept,
                jnp.maximum(damping * damping_down, damping_min),
                jnp.minimum(damping * damping_up, damping_max),
            )
            return new_twist, new_damping, accept, rejects + 1, cand_loss

        twist, damping, accepted, _, cand_loss = lax.while_loop(
            try_cond, try_body,
            (state.twist, state.damping, jnp.asarray(False), jnp.asarray(0, jnp.int32),
             last_loss),
        )
        new_loss = jnp.where(accepted, cand_loss, last_loss)
        improved = (last_loss - new_loss) > plateau_decreasing
        plateau = jnp.where(improved, 0, state.plateau + 1)
        done = (plateau >= plateau_patience) | ~accepted
        return _LMState(twist, new_loss, damping, state.step + 1, plateau, done)

    final = lax.while_loop(outer_cond, outer_body, init)
    return se3.normalize(se3.mul(data.pose0, se3.exp(final.twist)))
