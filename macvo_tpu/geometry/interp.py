"""Pose interpolation utilities (reference: Utility/Math.py:7-40,96-121).

Used by the terminal map processors to repair ``need_interp`` frames and by
evaluation to align ground-truth timestamps to estimates.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import se3


def slerp(q0: jnp.ndarray, q1: jnp.ndarray, tau: jnp.ndarray, dot_threshold: float = 0.9995) -> jnp.ndarray:
    """Spherical linear interpolation of (N,4) quaternions, branch-free."""
    dot = jnp.sum(q0 * q1, axis=-1)
    q1 = jnp.where(dot[..., None] < 0, -q1, q1)
    dot = jnp.abs(dot)

    # Near-parallel: linear interpolation then renormalize.
    lin = q0 + tau[..., None] * (q1 - q0)
    lin = lin / jnp.maximum(jnp.linalg.norm(lin, axis=-1, keepdims=True), 1e-12)

    theta0 = jnp.arccos(jnp.clip(dot, -1.0, 1.0))
    sin_theta0 = jnp.maximum(jnp.sin(theta0), 1e-12)
    theta = theta0 * tau
    s0 = jnp.cos(theta) - dot * jnp.sin(theta) / sin_theta0
    s1 = jnp.sin(theta) / sin_theta0
    sph = s0[..., None] * q0 + s1[..., None] * q1
    sph = sph / jnp.maximum(jnp.linalg.norm(sph, axis=-1, keepdims=True), 1e-12)

    return jnp.where(dot[..., None] > dot_threshold, lin, sph)


def qinterp(qs: jnp.ndarray, t: jnp.ndarray, t_int: jnp.ndarray) -> jnp.ndarray:
    """Interpolate a quaternion time series (N,4)@t onto query times t_int."""
    idx1 = jnp.clip(jnp.searchsorted(t, t_int), 0, t.shape[0] - 1)
    idx0 = jnp.clip(idx1 - 1, 0, t.shape[0] - 1)
    t0, t1 = t[idx0], t[idx1]
    dt = jnp.where(idx0 == idx1, 1.0, t1 - t0)
    tau = jnp.where(idx0 == idx1, 0.0, (t_int - t0) / dt)
    return slerp(qs[idx0], qs[idx1], tau)


def interpolate_pose(
    poses: jnp.ndarray, ts: jnp.ndarray, ts_ev: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Geodesic (Log/Exp) interpolation of an SE3 sequence onto query times.

    poses: (N,7), ts: (N,) strictly increasing, ts_ev: (M,).
    Returns (M,7) poses and an (M,) bool mask of *extrapolated* (clamped)
    queries — matching the reference's ``~interp_mask`` return
    (Utility/Math.py:96-121).
    """
    idx_end = jnp.clip(jnp.searchsorted(ts, ts_ev, side="left"), 1, ts.shape[0] - 1)
    idx_start = idx_end - 1
    p0, p1 = poses[idx_start], poses[idx_end]
    t0, t1 = ts[idx_start], ts[idx_end]
    tau = (ts_ev - t0) / jnp.maximum(t1 - t0, 1e-12)

    before = ts_ev <= ts[0]
    after = ts_ev >= ts[-1]
    tau = jnp.clip(jnp.where(before, 0.0, jnp.where(after, 1.0, tau)), 0.0, 1.0)

    delta = se3.log(se3.mul(p1, se3.inv(p0)))
    interp = se3.mul(se3.exp(tau[..., None] * delta), p0)
    interp = jnp.where(before[..., None], poses[0], interp)
    interp = jnp.where(after[..., None], poses[-1], interp)
    return interp, before | after


def cumulative_motions(init_pose: jnp.ndarray, motions: jnp.ndarray) -> jnp.ndarray:
    """Compose a motion sequence into a trajectory: pose_i = pose_{i-1} @ m_i.

    Quaternions are renormalized at every step — the reference cites pypose
    cumprod instability and uses ``pp.cumops`` + ``NormalizeQuat``
    (Module/MapProcessor.py:52-80, Utility/Math.py:124-133). Host-side helper
    (runs once per sequence); a scan version lives in the jitted paths.
    """
    import jax

    dtype = jnp.promote_types(init_pose.dtype, motions.dtype)
    init_pose = init_pose.astype(dtype)
    motions = motions.astype(dtype)

    def step(pose, motion):
        nxt = se3.normalize(se3.mul(pose, motion))
        return nxt, nxt

    _, traj = jax.lax.scan(step, init_pose, motions)
    return jnp.concatenate([init_pose[None], traj], axis=0)
