"""Fixed-shape selection primitives: NMS, masked random top-K, masked medians.

This file is the TPU-native answer to the reference's keypoint-selection
bottleneck: ``torch.nonzero`` + ``randperm`` forces a host-device sync per
frame (Module/KeypointSelector.py:325-334, flagged there as the perf
bottleneck). Here selection is a fixed-K ``lax.top_k`` over *randomized
scores*: masked positions get i.i.d. uniform scores, unmasked get ``-inf``,
so the top-K is a uniform random K-subset of the masked set — same sampling
distribution as the reference, zero host syncs, static shapes end to end.
Callers thread the returned validity mask instead of shrinking arrays.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def border_mask(height: int, width: int, margin: int, dtype=jnp.bool_) -> jnp.ndarray:
    """(H,W) mask that is True at least ``margin`` pixels away from the border."""
    if margin <= 0:
        return jnp.ones((height, width), dtype=dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    return (
        (rows >= margin) & (rows < height - margin) & (cols >= margin) & (cols < width - margin)
    ).astype(dtype)


def max_pool2d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Same-size max pool over the (H,W) axes of an (H,W) array."""
    pad = kernel_size // 2
    return lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        lax.max,
        window_dimensions=(kernel_size, kernel_size),
        window_strides=(1, 1),
        padding=((pad, pad), (pad, pad)),
    )


def min_pool2d(x: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    return -max_pool2d(-x, kernel_size)


def local_min_nms(quality: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """True where ``quality`` is the local *minimum* (lower = better) and finite
    (reference NMS: Module/KeypointSelector.py:282-288)."""
    eroded = min_pool2d(quality, kernel_size)
    return (quality == eroded) & ~jnp.isnan(quality)


def local_max_nms(score: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """True where ``score`` is the local maximum (higher = better)."""
    dilated = max_pool2d(score, kernel_size)
    return (score == dilated) & ~jnp.isnan(score)


def laplacian_magnitude(image: jnp.ndarray) -> jnp.ndarray:
    """|Laplacian| of an (H,W,3) image summed over RGB -> (H,W).

    Matches the reference gradient selector's conv with kernel
    [[0,1,0],[1,-4,1],[0,1,0]] expanded over channels
    (Module/KeypointSelector.py:121-137).
    """
    x = jnp.pad(image, ((1, 1), (1, 1), (0, 0)), mode="constant")
    lap = (
        x[:-2, 1:-1] + x[2:, 1:-1] + x[1:-1, :-2] + x[1:-1, 2:] - 4.0 * x[1:-1, 1:-1]
    )
    return jnp.abs(jnp.sum(lap, axis=-1))


@partial(jax.jit, static_argnames=("k",))
def masked_random_topk(
    mask: jnp.ndarray, k: int, key: jax.Array
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform random K-subset of True positions of an (H,W) mask — jitted,
    no host sync.

    Returns (uv (K,2) int32 in (u,v) order, valid (K,) bool). When fewer than
    K positions are masked, the tail is marked invalid (uv clamped to 0).
    """
    h, w = mask.shape
    scores = jnp.where(mask, jax.random.uniform(key, (h, w)), -jnp.inf)
    vals, flat_idx = lax.top_k(scores.reshape(-1), k)
    valid = jnp.isfinite(vals)
    v = (flat_idx // w).astype(jnp.int32)
    u = (flat_idx % w).astype(jnp.int32)
    uv = jnp.stack([u, v], axis=-1)
    return jnp.where(valid[:, None], uv, 0), valid


@partial(jax.jit, static_argnames=("k",))
def masked_score_topk(
    score: jnp.ndarray, mask: jnp.ndarray, k: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Top-K positions of an (H,W) score restricted to ``mask`` (higher = better)."""
    h, w = score.shape
    scores = jnp.where(mask & ~jnp.isnan(score), score, -jnp.inf)
    vals, flat_idx = lax.top_k(scores.reshape(-1), k)
    valid = jnp.isfinite(vals)
    v = (flat_idx // w).astype(jnp.int32)
    u = (flat_idx % w).astype(jnp.int32)
    uv = jnp.stack([u, v], axis=-1)
    return jnp.where(valid[:, None], uv, 0), valid


def masked_median(values: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of ``values`` where ``mask`` is True (NaN-safe), as a scalar.

    Replaces the reference's ``tensor[mask].nanmedian()`` dynamic-shape idiom
    (Module/KeypointSelector.py:299-307) with a fixed-shape nanquantile.
    """
    masked = jnp.where(mask & ~jnp.isnan(values), values, jnp.nan)
    return jnp.nanmedian(masked)
