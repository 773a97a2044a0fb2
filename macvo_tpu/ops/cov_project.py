"""2D->3D covariance projection kernels (paper core; reference:
Module/Covariance/Project2to3.py:337-443 and Utility/Math.py:43-93).

All functions are fixed-shape, vmap/jit friendly, and batch over N keypoints.
Coordinate convention is NED: index 0 of the 3x3 matrices is the z-forward
(depth) axis, so matrices are laid out
``[[s_zz, s_xz, s_yz], [s_xz, s_xx, s_xy], [s_yz, s_xy, s_yy]]``
(reference: Project2to3.py:419-423).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..geometry.gaussian import gaussian_full_kernels, gaussian_mixture_mean_var


def covariance_2to3_full(
    sigma_uu, sigma_uv, sigma_vv, sigma_dd, u, v, d, fx, fy, cx, cy
) -> jnp.ndarray:
    """Full-covariance pixel->camera projection, (N,) inputs -> (N,3,3)
    (reference: Project2to3.py:377-423, paper App. A / Sect. III.C)."""
    du = u - cx
    dv = v - cy
    s_xx = (jnp.square(du) * sigma_dd + jnp.square(d) * sigma_uu + sigma_uu * sigma_dd) / fx**2
    s_yy = (jnp.square(dv) * sigma_dd + jnp.square(d) * sigma_vv + sigma_vv * sigma_dd) / fy**2
    s_zz = sigma_dd
    s_xy = (du * dv * sigma_dd + (jnp.square(d) + sigma_dd) * sigma_uv) / (fx * fy)
    s_xz = sigma_dd * du / fx
    s_yz = sigma_dd * dv / fy
    row0 = jnp.stack([s_zz, s_xz, s_yz], axis=-1)
    row1 = jnp.stack([s_xz, s_xx, s_xy], axis=-1)
    row2 = jnp.stack([s_yz, s_xy, s_yy], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def covariance_2to3_diag(sigma_uu, sigma_vv, sigma_dd, u, v, d, fx, fy, cx, cy) -> jnp.ndarray:
    """Diagonal-flow-cov variant (reference: Project2to3.py:337-374)."""
    return covariance_2to3_full(
        sigma_uu, jnp.zeros_like(sigma_uu), sigma_vv, sigma_dd, u, v, d, fx, fy, cx, cy
    )


def gather_patches(dense: jnp.ndarray, kp_uv: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Extract (K,K) patches of a dense (H,W) map around N keypoints -> (N,K,K).

    ``patches[n, i, j] = dense[v_n + off_j, u_n + off_i]`` with offsets spanning
    ``[-K//2, K//2]`` — i indexes the u-offset, j the v-offset, aligning with
    the kernel orientation of geometry.gaussian.gaussian_full_kernels.
    Out-of-image taps clamp to the border (keypoints live inside the border
    margin, reference gathers rely on the same invariant:
    Project2to3.py:143-158).

    TPU-native formulation — extraction as MATMUL, zero gathers: one-hot
    column/row selector matrices turn the per-keypoint patch lookup into
    (a) ONE shared dense matmul ``(H,W) @ (W, N*K)`` that slices all
    keypoints' columns (MXU-perfect shapes) and (b) a batched (K,H)x(H,K)
    row selection. A 2M-element random gather is the single most
    TPU-hostile op in the mapping pipeline; as matmuls the whole dense-
    mapping covariance path is FLOP-cheap MXU work.
    """
    h, w = dense.shape
    half = kernel_size // 2
    offsets = jnp.arange(-half, half + 1)
    u_idx = jnp.clip(kp_uv[:, 0].astype(jnp.int32)[:, None] + offsets[None], 0, w - 1)
    v_idx = jnp.clip(kp_uv[:, 1].astype(jnp.int32)[:, None] + offsets[None], 0, h - 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, w, 1), 1)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, h, 1), 1)
    sel_u = (u_idx[:, None, :] == cols).astype(dense.dtype)      # (N, W, K)
    sel_v = (v_idx[:, None, :] == rows).astype(dense.dtype)      # (N, H, K)
    tmp = jnp.einsum("hw,nwi->nhi", dense, sel_u)                # (N, H, K)
    return jnp.einsum("nhj,nhi->nij", sel_v, tmp)                # (N, K, K)


def _prepare_flow_cov(flow_cov, n, min_flow_cov, match_cov_default, has_flow_cov: bool):
    """Clamp provided flow cov to the pixel-quantization floor, or synthesize the
    default isotropic cov (reference: Project2to3.py:128-140)."""
    if has_flow_cov:
        clamped = jnp.maximum(flow_cov[..., :2], min_flow_cov**2)
        return jnp.concatenate([clamped, flow_cov[..., 2:3]], axis=-1)
    default = jnp.full((n, 3), match_cov_default, dtype=jnp.float32)
    return default.at[..., 2].set(0.0)


@partial(jax.jit, static_argnames=("kernel_size", "has_flow_cov", "has_depth_cov"))
def match_covariance(
    depth_map: jnp.ndarray,      # (H,W)
    kp_uv: jnp.ndarray,          # (N,2) float (u,v)
    depth_cov: jnp.ndarray,      # (N,) per-keypoint depth variance (or zeros)
    flow_cov: jnp.ndarray,       # (N,3) (s_uu, s_vv, s_uv) (or zeros)
    fx, fy, cx, cy,
    kernel_size: int,
    match_cov_default: float,
    min_flow_cov: float,
    min_depth_cov: float,
    has_flow_cov: bool,
    has_depth_cov: bool,
) -> jnp.ndarray:
    """MAC-VO MatchCovariance (reference: Project2to3.py:114-191, paper III.C).

    Builds per-keypoint anisotropic Gaussian kernels from the 2x2 flow cov,
    computes the kernel-weighted local depth mean and variance, and projects
    to a (N,3,3) float64 camera-frame covariance.
    """
    n = kp_uv.shape[0]
    flow_cov = _prepare_flow_cov(flow_cov, n, min_flow_cov, match_cov_default, has_flow_cov)
    var_u, var_v, var_uv = flow_cov[..., 0], flow_cov[..., 1], flow_cov[..., 2]

    cov_2x2 = jnp.stack(
        [jnp.stack([var_u, var_uv], -1), jnp.stack([var_uv, var_v], -1)], axis=-2
    )
    kernels = gaussian_full_kernels(cov_2x2, kernel_size)          # (N,K,K)
    patches = gather_patches(depth_map, kp_uv, kernel_size)        # (N,K,K)

    wavg_depth = jnp.sum(kernels * patches, axis=(-1, -2))
    if has_flow_cov or not has_depth_cov:
        wvar_depth = jnp.sum(
            kernels * jnp.square(patches - wavg_depth[:, None, None]), axis=(-1, -2)
        )
    else:
        wvar_depth = depth_cov
    wvar_depth = jnp.maximum(wvar_depth, min_depth_cov)

    return covariance_2to3_full(
        var_u, var_uv, var_v, wvar_depth,
        kp_uv[..., 0], kp_uv[..., 1], wavg_depth, fx, fy, cx, cy,
    ).astype(jnp.float64)


@partial(jax.jit, static_argnames=("kernel_size", "has_flow_cov", "has_depth_cov"))
def gaussian_mixture_covariance(
    depth_map: jnp.ndarray,
    depth_cov_map: jnp.ndarray,
    kp_uv: jnp.ndarray,
    depth_cov: jnp.ndarray,
    flow_cov: jnp.ndarray,
    fx, fy, cx, cy,
    kernel_size: int,
    match_cov_default: float,
    min_flow_cov: float,
    min_depth_cov: float,
    has_flow_cov: bool,
    has_depth_cov: bool,
) -> jnp.ndarray:
    """Gaussian-mixture variant: the depth patch is a mixture of per-pixel
    Gaussians weighted by the flow kernel (reference: Project2to3.py:194-272)."""
    n = kp_uv.shape[0]
    flow_cov = _prepare_flow_cov(flow_cov, n, min_flow_cov, match_cov_default, has_flow_cov)
    var_u, var_v, var_uv = flow_cov[..., 0], flow_cov[..., 1], flow_cov[..., 2]

    cov_2x2 = jnp.stack(
        [jnp.stack([var_u, var_uv], -1), jnp.stack([var_uv, var_v], -1)], axis=-2
    )
    kernels = gaussian_full_kernels(cov_2x2, kernel_size)
    patches = gather_patches(depth_map, kp_uv, kernel_size)
    cov_patches = gather_patches(depth_cov_map, kp_uv, kernel_size)

    k2 = kernel_size * kernel_size
    wavg_depth, wvar_depth = gaussian_mixture_mean_var(
        patches.reshape(n, k2), cov_patches.reshape(n, k2), kernels.reshape(n, k2)
    )
    if (not has_flow_cov) and has_depth_cov:
        wvar_depth = depth_cov
    wvar_depth = jnp.maximum(wvar_depth, min_depth_cov)

    return covariance_2to3_full(
        var_u, var_uv, var_v, wvar_depth,
        kp_uv[..., 0], kp_uv[..., 1], wavg_depth, fx, fy, cx, cy,
    ).astype(jnp.float64)


@jax.jit
def depth_only_covariance(
    kp_uv: jnp.ndarray, depth_cov: jnp.ndarray, fx, fy, cx, cy, regularization
) -> jnp.ndarray:
    """Depth-cov-only projection + epsilon*I rank regularization
    (reference: Project2to3.py:60-111; the regularizer is vital for the LM
    solver when flow cov is absent)."""
    factor_x = (kp_uv[..., 0] - cx) / fx
    factor_y = (kp_uv[..., 1] - cy) / fy
    var_z = depth_cov
    var_x = jnp.square(factor_x) * depth_cov
    var_y = jnp.square(factor_y) * depth_cov
    cov_xy = factor_x * factor_y * var_z
    cov_xz = factor_x * var_z
    cov_yz = factor_y * var_z
    row0 = jnp.stack([var_z, cov_xz, cov_yz], -1)
    row1 = jnp.stack([cov_xz, var_x, cov_xy], -1)
    row2 = jnp.stack([cov_yz, cov_xy, var_y], -1)
    cov = jnp.stack([row0, row1, row2], axis=-2).astype(jnp.float64)
    return cov + regularization * jnp.eye(3, dtype=jnp.float64)
