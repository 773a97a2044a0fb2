"""SE(3) Lie-group operations in pure jnp — the framework's PyPose replacement.

A pose is a ``(..., 7)`` array ``[tx, ty, tz, qx, qy, qz, qw]`` (translation +
unit quaternion, scalar-last) matching the layout the reference stores in its
map (Module/Map/Template.py:5-43 stores pose as 7 floats via pypose SE3).
A twist (se3 tangent) is ``(..., 6)`` ``[rho(3), phi(3)]`` with ``rho`` the
translational and ``phi`` the rotational component.

All functions are shape-polymorphic over leading batch dims, jit/vmap-safe
(no data-dependent control flow; small-angle branches use ``jnp.where`` with
Taylor fallbacks), and dtype-preserving.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-8


def _safe_norm(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Norm with a smooth, NaN-free gradient at v = 0.

    ``jnp.linalg.norm`` has d|v|/dv = v/|v| which is NaN at the origin and
    poisons autodiff through ``jnp.where`` small-angle guards. Adding a tiny
    constant under the sqrt gives gradient 0 at the origin with O(1e-24)
    value error — required for jax.jacfwd/jacrev through exp/log (used by the
    solver Jacobian cross-checks and any learned module differentiating
    through poses)."""
    sq = jnp.sum(v * v, axis=-1, keepdims=keepdims)
    return jnp.sqrt(sq + 1e-24)


def identity(batch_shape: tuple[int, ...] = (), dtype=jnp.float32) -> jnp.ndarray:
    pose = jnp.zeros(batch_shape + (7,), dtype=dtype)
    return pose.at[..., 6].set(1.0)


def translation(pose: jnp.ndarray) -> jnp.ndarray:
    return pose[..., :3]


def quaternion(pose: jnp.ndarray) -> jnp.ndarray:
    return pose[..., 3:7]


def from_t_q(t: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([t, q], axis=-1)


# -- quaternion algebra (scalar-last xyzw) -------------------------------------

def quat_mul(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    x1, y1, z1, w1 = jnp.moveaxis(q1, -1, 0)
    x2, y2, z2, w2 = jnp.moveaxis(q2, -1, 0)
    return jnp.stack(
        [
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        ],
        axis=-1,
    )


def quat_conj(q: jnp.ndarray) -> jnp.ndarray:
    return q * jnp.array([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)


def quat_normalize(q: jnp.ndarray) -> jnp.ndarray:
    return q / jnp.maximum(_safe_norm(q, keepdims=True), _EPS)


def quat_rotate(q: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors v (...,3) by quaternions q (...,4): R(q) v."""
    qv = q[..., :3]
    qw = q[..., 3:4]
    uv = jnp.cross(qv, v)
    uuv = jnp.cross(qv, uv)
    return v + 2.0 * (qw * uv + uuv)


def quat_to_matrix(q: jnp.ndarray) -> jnp.ndarray:
    x, y, z, w = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def quat_from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix (...,3,3) -> quaternion, branch-free (Shepperd's method
    evaluated on all four candidates and selected by jnp.where)."""
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22

    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, _EPS))

    # Candidate w-major
    qw0 = 0.5 * safe_sqrt(1.0 + tr)
    s0 = 4.0 * qw0
    cand0 = jnp.stack([(m21 - m12) / s0, (m02 - m20) / s0, (m10 - m01) / s0, qw0], -1)
    # Candidate x-major
    qx1 = 0.5 * safe_sqrt(1.0 + m00 - m11 - m22)
    s1 = 4.0 * qx1
    cand1 = jnp.stack([qx1, (m01 + m10) / s1, (m02 + m20) / s1, (m21 - m12) / s1], -1)
    # Candidate y-major
    qy2 = 0.5 * safe_sqrt(1.0 - m00 + m11 - m22)
    s2 = 4.0 * qy2
    cand2 = jnp.stack([(m01 + m10) / s2, qy2, (m12 + m21) / s2, (m02 - m20) / s2], -1)
    # Candidate z-major
    qz3 = 0.5 * safe_sqrt(1.0 - m00 - m11 + m22)
    s3 = 4.0 * qz3
    cand3 = jnp.stack([(m02 + m20) / s3, (m12 + m21) / s3, qz3, (m10 - m01) / s3], -1)

    cond0 = tr > 0.0
    cond1 = (m00 >= m11) & (m00 >= m22)
    cond2 = m11 >= m22
    q = jnp.where(
        cond0[..., None],
        cand0,
        jnp.where(cond1[..., None], cand1, jnp.where(cond2[..., None], cand2, cand3)),
    )
    return quat_normalize(q)


# -- SO(3) exp/log -------------------------------------------------------------

def so3_exp(phi: jnp.ndarray) -> jnp.ndarray:
    """Rotation vector (...,3) -> quaternion."""
    angle = _safe_norm(phi, keepdims=True)
    half = 0.5 * angle
    small = angle < 1e-6
    # sin(half)/angle with Taylor fallback 0.5 - angle^2/48
    k = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.maximum(angle, _EPS))
    qv = phi * k
    qw = jnp.where(small, 1.0 - half * half / 2.0, jnp.cos(half))
    return quat_normalize(jnp.concatenate([qv, qw], axis=-1))


def so3_log(q: jnp.ndarray) -> jnp.ndarray:
    """Quaternion -> rotation vector (...,3)."""
    q = quat_normalize(q)
    # Force w >= 0 to get the short rotation.
    q = jnp.where(q[..., 3:4] < 0, -q, q)
    qv = q[..., :3]
    qw = q[..., 3]
    sin_half = _safe_norm(qv)
    half = jnp.arctan2(sin_half, qw)
    small = sin_half < 1e-6
    k = jnp.where(small, 2.0 / jnp.maximum(qw, _EPS), 2.0 * half / jnp.maximum(sin_half, _EPS))
    return qv * k[..., None]


def skew(v: jnp.ndarray) -> jnp.ndarray:
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zero, -z, y], -1),
            jnp.stack([z, zero, -x], -1),
            jnp.stack([-y, x, zero], -1),
        ],
        axis=-2,
    )


def _left_jacobian(phi: jnp.ndarray) -> jnp.ndarray:
    """SO(3) left Jacobian J_l(phi), (...,3,3)."""
    angle = _safe_norm(phi)
    small = angle < 1e-6
    a = jnp.maximum(angle, _EPS)
    K = skew(phi / a[..., None])
    sin_a, cos_a = jnp.sin(a), jnp.cos(a)
    c1 = jnp.where(small, 0.5 - angle**2 / 24.0, (1 - cos_a) / (a * a))
    c2 = jnp.where(small, 1.0 / 6.0 - angle**2 / 120.0, (a - sin_a) / (a**3))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    Ka = K * a[..., None, None]
    return eye + c1[..., None, None] * Ka + c2[..., None, None] * (Ka @ Ka)


def _left_jacobian_inv(phi: jnp.ndarray) -> jnp.ndarray:
    angle = _safe_norm(phi)
    small = angle < 1e-6
    a = jnp.maximum(angle, _EPS)
    K = skew(phi)
    half = 0.5 * a
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + angle**2 / 720.0,
        (1.0 / (a * a)) - (1.0 + jnp.cos(a)) / (2.0 * a * jnp.sin(a) + _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=phi.dtype), K.shape)
    return eye - 0.5 * K + cot_term[..., None, None] * (K @ K)


# -- SE(3) ---------------------------------------------------------------------

def exp(twist: jnp.ndarray) -> jnp.ndarray:
    """se3 twist (...,6) [rho, phi] -> SE3 pose (...,7)."""
    rho, phi = twist[..., :3], twist[..., 3:6]
    q = so3_exp(phi)
    t = jnp.einsum("...ij,...j->...i", _left_jacobian(phi), rho)
    return from_t_q(t, q)


def log(pose: jnp.ndarray) -> jnp.ndarray:
    """SE3 pose (...,7) -> se3 twist (...,6)."""
    phi = so3_log(quaternion(pose))
    rho = jnp.einsum("...ij,...j->...i", _left_jacobian_inv(phi), translation(pose))
    return jnp.concatenate([rho, phi], axis=-1)


def mul(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Compose poses: (a @ b)."""
    qa, qb = quaternion(a), quaternion(b)
    t = translation(a) + quat_rotate(qa, translation(b))
    return from_t_q(t, quat_normalize(quat_mul(qa, qb)))


def inv(pose: jnp.ndarray) -> jnp.ndarray:
    q_inv = quat_conj(quaternion(pose))
    t_inv = -quat_rotate(q_inv, translation(pose))
    return from_t_q(t_inv, q_inv)


def act(pose: jnp.ndarray, points: jnp.ndarray) -> jnp.ndarray:
    """Apply pose to points (...,3): R p + t."""
    return quat_rotate(quaternion(pose), points) + translation(pose)


def matrix(pose: jnp.ndarray) -> jnp.ndarray:
    """Pose -> homogeneous (...,4,4)."""
    R = quat_to_matrix(quaternion(pose))
    t = translation(pose)
    batch = pose.shape[:-1]
    out = jnp.zeros(batch + (4, 4), dtype=pose.dtype)
    out = out.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    return out.at[..., 3, 3].set(1.0)


def rotmat(pose: jnp.ndarray) -> jnp.ndarray:
    return quat_to_matrix(quaternion(pose))


def from_matrix(m: jnp.ndarray) -> jnp.ndarray:
    return from_t_q(m[..., :3, 3], quat_from_matrix(m[..., :3, :3]))


def normalize(pose: jnp.ndarray) -> jnp.ndarray:
    """Renormalize the quaternion part (reference: Utility/Math.py:124-133)."""
    return from_t_q(translation(pose), quat_normalize(quaternion(pose)))


def relative(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """a^-1 @ b — the motion taking frame a to frame b."""
    return mul(inv(a), b)
