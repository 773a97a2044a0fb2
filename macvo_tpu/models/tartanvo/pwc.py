"""PWC-DC optical-flow network (flax, channel-last) — TartanVO's flow core.

Capability-equivalent rebuild of the reference PWC-DC net
(Module/Network/PWCNet/pwc/pwc_model.py:30-246): 6-level conv pyramid,
coarse-to-fine decoding with feature warping, 9x9 local correlation (the
Pallas kernel in ops/correlation.py — the reference's cupy CUDA kernels),
DenseNet-connected flow estimators, and a dilated context network at the
finest level. Output flow is at 1/4 resolution scaled by ``1/flow_norm``
(TartanVO convention: flow_norm=20 at train scale, 0.05 applied downstream,
StereoVO_Interface.py:154-194).
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ...ops.correlation import local_correlation

LEVEL_DIMS = (16, 32, 64, 96, 128, 196)
DENSE_DIMS = (128, 128, 96, 64, 32)


def _leaky(x):
    return nn.leaky_relu(x, 0.1)


def warp_features(feat: jnp.ndarray, flow: jnp.ndarray) -> jnp.ndarray:
    """Backward-warp features by flow with out-of-bounds zeroing
    (reference: pwc_model.py:126-159)."""
    from ..flowformer.decoder import bilinear_sample, coords_grid

    b, h, w, _ = feat.shape
    coords = coords_grid(b, h, w) + flow
    warped = bilinear_sample(feat, coords)
    inb = (
        (coords[..., 0] >= 0) & (coords[..., 0] <= w - 1)
        & (coords[..., 1] >= 0) & (coords[..., 1] <= h - 1)
    )
    return warped * inb[..., None]


class PyramidEncoder(nn.Module):
    """6-level stride-2 pyramid; each level = 3 leaky convs."""

    dims: Sequence[int] = LEVEL_DIMS

    @nn.compact
    def __call__(self, x) -> list[jnp.ndarray]:
        feats = []
        for lvl, dim in enumerate(self.dims):
            x = _leaky(nn.Conv(dim, (3, 3), strides=(2, 2), padding="SAME",
                               name=f"conv{lvl}a")(x))
            x = _leaky(nn.Conv(dim, (3, 3), padding="SAME", name=f"conv{lvl}b")(x))
            x = _leaky(nn.Conv(dim, (3, 3), padding="SAME", name=f"conv{lvl}c")(x))
            feats.append(x)
        return feats


class DenseFlowEstimator(nn.Module):
    """DenseNet-connected flow decoder block; returns (features, flow)."""

    @nn.compact
    def __call__(self, x):
        for i, dim in enumerate(DENSE_DIMS):
            y = _leaky(nn.Conv(dim, (3, 3), padding="SAME", name=f"conv{i}")(x))
            x = jnp.concatenate([y, x], axis=-1)
        flow = nn.Conv(2, (3, 3), padding="SAME", name="predict")(x)
        return x, flow


class ContextNet(nn.Module):
    """Dilated refinement network at the finest decode level
    (reference dc_conv1-7, pwc_model.py:119-124)."""

    @nn.compact
    def __call__(self, x):
        dil = [(128, 1), (128, 2), (128, 4), (96, 8), (64, 16), (32, 1)]
        for i, (dim, d) in enumerate(dil):
            x = _leaky(nn.Conv(dim, (3, 3), padding="SAME", kernel_dilation=(d, d),
                               name=f"dc{i}")(x))
        return nn.Conv(2, (3, 3), padding="SAME", name="dc_out")(x)


def _upsample2x(x: jnp.ndarray) -> jnp.ndarray:
    b, h, w, c = x.shape
    return jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)


class PWCFlowNet(nn.Module):
    """(img1, img2) (B,H,W,3) -> flow at 1/4 resolution (B,H/4,W/4,2).

    Warp scales per level follow the reference's coarse-to-fine constants
    (0.625 / 1.25 / 2.5 / 5.0, pwc_model.py:193-236).
    """

    md: int = 4
    flow_norm: float = 20.0

    @nn.compact
    def __call__(self, img1, img2, return_features: bool = False):
        enc = PyramidEncoder(name="pyramid")
        f1 = enc(img1)
        f2 = enc(img2)

        warp_scales = {5: None, 4: 0.625, 3: 1.25, 2: 2.5, 1: 5.0}
        up_flow = None
        up_feat = None
        x = None
        flow = None
        for lvl in range(5, 0, -1):  # pyramid levels 1/64 .. 1/4
            if up_flow is None:
                corr = _leaky(local_correlation(f1[lvl], f2[lvl], self.md))
                x = corr
            else:
                warped = warp_features(f2[lvl], up_flow * warp_scales[lvl])
                corr = _leaky(local_correlation(f1[lvl], warped, self.md))
                x = jnp.concatenate([corr, f1[lvl], up_flow, up_feat], axis=-1)
            x, flow = DenseFlowEstimator(name=f"estimator{lvl}")(x)
            if lvl > 1:
                up_flow = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                                           name=f"upflow{lvl}")(flow)
                up_feat = nn.ConvTranspose(2, (4, 4), strides=(2, 2), padding="SAME",
                                           name=f"upfeat{lvl}")(x)

        flow = flow + ContextNet(name="context")(x)
        if return_features:
            return flow, x
        return flow
