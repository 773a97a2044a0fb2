"""Pinhole camera model in the NED convention (reference: Utility/Point.py:5-21).

Coordinate conventions (reference README.md:225-231): image uv is east-down
(u right, v down); the camera/world frame is NED — x forward, y right (east),
z down. Depth is the forward (x) coordinate. Hence

    point = [d, (u - cx) d / fx, (v - cy) d / fy]
    u = fx * p_y / p_x + cx ,  v = fy * p_z / p_x + cy .

All functions broadcast over leading batch dims; K is (..., 3, 3).
"""

from __future__ import annotations

import jax.numpy as jnp


def intrinsics(fx: float, fy: float, cx: float, cy: float, dtype=jnp.float32) -> jnp.ndarray:
    return jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=dtype)


def pixel_to_point_ned(kp_uv: jnp.ndarray, depth: jnp.ndarray, K: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) pixels + (...,) depth -> (..., 3) NED camera points."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u, v = kp_uv[..., 0], kp_uv[..., 1]
    y = (u - cx) * depth / fx
    z = (v - cy) * depth / fy
    return jnp.stack([depth, y, z], axis=-1)


def point_to_pixel_ned(points: jnp.ndarray, K: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """(..., 3) NED camera points -> (..., 2) pixels."""
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    x = jnp.where(jnp.abs(points[..., 0]) < eps, eps, points[..., 0])
    u = fx * points[..., 1] / x + cx
    v = fy * points[..., 2] / x + cy
    return jnp.stack([u, v], axis=-1)


def in_bounds(kp_uv: jnp.ndarray, width: int, height: int, margin: float = 0.0) -> jnp.ndarray:
    """Boolean mask of pixels inside the image with an optional border margin."""
    u, v = kp_uv[..., 0], kp_uv[..., 1]
    return (
        (u >= margin)
        & (u <= width - 1 - margin)
        & (v >= margin)
        & (v <= height - 1 - margin)
    )


def disparity_to_depth(disparity: jnp.ndarray, baseline, fx, eps: float = 1e-6) -> jnp.ndarray:
    """depth = baseline * fx / disparity (reference: StereoDepth.py:270-272)."""
    return baseline * fx / jnp.maximum(disparity, eps)


def disparity_to_depth_cov(
    disparity: jnp.ndarray, disparity_cov: jnp.ndarray, baseline, fx, eps: float = 1e-6
) -> jnp.ndarray:
    """First-order propagation of disparity variance to depth variance:
    sigma_d = (bl*fx)^2 * sigma_disp / disp^4 (reference: StereoDepth.py:276-282)."""
    disp4 = jnp.maximum(disparity, eps) ** 4
    return (baseline * fx) ** 2 * disparity_cov / disp4
