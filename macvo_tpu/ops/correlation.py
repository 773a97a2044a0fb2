"""Local (windowed) correlation cost volume — Pallas TPU kernel + XLA twin.

TPU-native replacement for the reference's only in-tree CUDA code: the cupy
RawModule correlation kernels used by the PWC-Net family
(Module/Network/PWCNet/pwc/correlation.py:8-382 — ``kernel_Correlation_
rearrange`` / ``updateOutput`` compute a 9x9 (81-channel) cost volume with
shared-memory patch staging; the hand-written backward kernels at :329-372
are replaced by ``jax.custom_vjp`` over the XLA twin, so gradients come from
autodiff, not hand-derived kernels).

Contract (channel-last): ``out[b, y, x, (dy+r)*(2r+1)+(dx+r)] =
mean_c f1[b,y,x,c] * f2[b, y+dy, x+dx, c]`` with zero padding outside f2.

Kernel design: grid over (batch, row-tiles). Pallas BlockSpecs are in BLOCK
units, so the vertical halo is fed as three row-aligned tiles (prev/cur/next)
of a top-padded copy of f2; the kernel stitches them in VMEM and emits all
(2r+1)^2 displacement channels as shifted multiply-reduce over the lane
(channel) axis — pure VPU work, zero gathers, one HBM read per input row
(amortized; neighbor tiles are re-fetched, 3x read amplification traded for
a gather-free inner loop).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def local_correlation_xla(f1: jnp.ndarray, f2: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Same contract in pure XLA — the autodiff path and non-TPU fallback."""
    b, h, w, c = f1.shape
    k = 2 * radius + 1
    f2p = jnp.pad(f2, ((0, 0), (radius, radius), (radius, radius), (0, 0)))
    outs = []
    for dy in range(k):
        for dx in range(k):
            shifted = jax.lax.dynamic_slice(f2p, (0, dy, dx, 0), (b, h, w, c))
            outs.append(jnp.sum(f1 * shifted, axis=-1))
    return jnp.stack(outs, axis=-1) / c


def _corr_kernel(f1_ref, f2_prev_ref, f2_cur_ref, f2_next_ref, out_ref, *,
                 radius: int, tile_h: int, width: int, channels: int):
    k = 2 * radius + 1
    f1 = f1_ref[0]                                           # (tile_h, W, C)
    rows = jnp.concatenate(
        [f2_prev_ref[0], f2_cur_ref[0], f2_next_ref[0]], axis=0
    )                                                        # (3*tile_h, W+2r, C)
    base = tile_h - radius
    inv_c = 1.0 / channels
    # One dy-row of taps at a time: emitting all k*k displacement slices in a
    # single stack made Mosaic materialize every (tile_h, W, C) shifted block
    # at once — 81 * ~0.4 MB blew the 16 MB VMEM scope at 480-wide inputs.
    # Chunked writes bound live intermediates to one dy group (k blocks).
    for dy in range(k):
        acc = []
        for dx in range(k):
            f2_blk = rows[base + dy : base + dy + tile_h, dx : dx + width, :]
            acc.append(jnp.sum(f1 * f2_blk, axis=-1))
        out_ref[0, :, :, dy * k : (dy + 1) * k] = jnp.stack(acc, axis=-1) * inv_c


def local_correlation_pallas(f1: jnp.ndarray, f2: jnp.ndarray, radius: int = 4,
                             tile_h: int = 8) -> jnp.ndarray:
    """Pallas forward (TPU). Requires radius <= tile_h (9x9 default: r=4)."""
    assert radius <= tile_h, "halo must fit in one neighbor tile"
    b, h, w, c = f1.shape
    k = 2 * radius + 1
    pad_h = (-h) % tile_h
    hp = h + pad_h
    f1p = jnp.pad(f1, ((0, 0), (0, pad_h), (0, 0), (0, 0)))
    # One tile of zeros above and below (plus row alignment), radius sideways.
    f2p = jnp.pad(
        f2, ((0, 0), (tile_h, tile_h + pad_h), (radius, radius), (0, 0))
    )

    kernel = partial(_corr_kernel, radius=radius, tile_h=tile_h, width=w, channels=c)
    f2_spec = lambda shift: pl.BlockSpec(
        (1, tile_h, w + 2 * radius, c),
        lambda bi, ti, s=shift: (bi, ti + s, 0, 0),
        memory_space=pltpu.VMEM,
    )
    out = pl.pallas_call(
        kernel,
        grid=(b, hp // tile_h),
        in_specs=[
            pl.BlockSpec((1, tile_h, w, c), lambda bi, ti: (bi, ti, 0, 0),
                         memory_space=pltpu.VMEM),
            f2_spec(0),   # rows above (padded coords: tile ti)
            f2_spec(1),   # the aligned rows
            f2_spec(2),   # rows below
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, k * k), lambda bi, ti: (bi, ti, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, k * k), f1.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * hp * w * c * k * k,
            bytes_accessed=(f1p.size + 3 * f2p.size + b * hp * w * k * k) * 4,
            transcendentals=0,
        ),
    )(f1p, f2p, f2p, f2p)
    return out[:, :h]


@partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_correlation(f1: jnp.ndarray, f2: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Windowed correlation: (B,H,W,C) x2 -> (B,H,W,(2r+1)^2).

    Pallas forward on TPU, XLA twin elsewhere; gradients via ``jax.vjp`` of
    the XLA twin (replacing the reference's hand-written CUDA backward
    kernels, correlation.py:329-372).
    """
    if jax.default_backend() == "tpu":
        return local_correlation_pallas(f1, f2, radius)
    return local_correlation_xla(f1, f2, radius)


def _fwd(f1, f2, radius):
    return local_correlation(f1, f2, radius), (f1, f2)


def _bwd(radius, res, g):
    f1, f2 = res
    _, vjp = jax.vjp(lambda a, b: local_correlation_xla(a, b, radius), f1, f2)
    return vjp(g)


local_correlation.defvjp(_fwd, _bwd)
