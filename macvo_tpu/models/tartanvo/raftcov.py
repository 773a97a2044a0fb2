"""RAFT-style recurrent flow-covariance net on PWC features (flax).

Capability-equivalent rebuild of the reference ``RAFTFlowCovNet``
(Module/Network/PWCNet/RAFTCov.py:123-189 + pwc_cov/gru.py:24-169): the PWC
flow net provides flow + decoder features; a GaussianGRU refines a log-sigma
map over ``iters`` recurrent steps from (context, cost-volume) inputs. Used
by ``TartanVOCovMatcher`` (Module/Frontend/Matching.py:233-278). Inference
returns ``(flow, exp(2*log_sigma))``.

The recurrence is a single ``nn.scan`` (shared weights) like the FlowFormer
decoder — one compiled loop, no Python unrolling.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..flowformer.decoder import SepConvGRU
from ...ops.correlation import local_correlation
from .pwc import PWCFlowNet, PyramidEncoder


class GaussianHead(nn.Module):
    """Two-conv log-sigma head (reference: pwc_cov/gru.py:79-88)."""

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", name="conv1")(x))
        return nn.Conv(2, (3, 3), padding="SAME", name="conv2")(x)


class GaussianIteration(nn.Module):
    """One GRU refinement step of the covariance state."""

    @nn.compact
    def __call__(self, carry, invariants):
        net, cov = carry
        inp, corr = invariants["inp"], invariants["corr"]
        enc = nn.relu(nn.Conv(128, (3, 3), padding="SAME", name="enc_corr")(corr))
        cov_enc = nn.relu(nn.Conv(64, (7, 7), padding="SAME", name="enc_cov")(cov))
        feat = jnp.concatenate([enc, cov_enc, inp], axis=-1)
        net = SepConvGRU(128, name="gru")(net, feat)
        delta = GaussianHead(name="head")(net)
        return (net, cov + delta), cov + delta


class GaussianGRU(nn.Module):
    """context + correlation -> per-iteration log-sigma maps
    (reference: pwc_cov/gru.py:24-77)."""

    iters: int = 4

    @nn.compact
    def __call__(self, context, corr):
        b, h, w, _ = context.shape
        proj = nn.Conv(256, (3, 3), padding="SAME", name="ctx_proj")(context)
        net = nn.tanh(proj[..., :128])
        inp = nn.relu(proj[..., 128:])
        cov0 = jnp.zeros((b, h, w, 2), context.dtype)

        Scan = nn.scan(
            GaussianIteration,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.iters,
        )
        (_, _), covs = Scan(name="iter")((net, cov0), {"inp": inp, "corr": corr})
        return covs  # (iters, B, h, w, 2) log-sigma at 1/4 res


class RAFTFlowCovNet(nn.Module):
    """(img1, img2) -> (flow 1/4-res, log-sigma stack 1/4-res)."""

    iters: int = 4

    @nn.compact
    def __call__(self, img1, img2):
        flow, feat = PWCFlowNet(name="pwc")(img1, img2, return_features=True)
        enc = PyramidEncoder(name="ctx_pyramid")(img1)
        ctx = enc[1]  # 1/4 resolution context
        corr = local_correlation(enc[1], PyramidEncoder(name="ctx_pyramid2")(img2)[1])
        covs = GaussianGRU(self.iters, name="gaussian")(ctx, nn.relu(corr))
        return flow, covs
