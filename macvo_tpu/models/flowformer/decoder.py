"""FlowFormerCov recurrent memory decoder with parallel covariance branch.

The decoder loop is the in-tree MemoryCovDecoder
(Module/Network/FlowFormerCov/covhead.py:46-140) re-architected for XLA: the
12 iterations run as ONE ``nn.scan`` (weights shared/broadcast, no Python
unrolling), the cross-attention K/V over the latent cost memory are computed
once before the scan (the reference caches them on first iteration,
covhead.py:99-103), and the fp32 islands the reference marks "MUST run in
fp32" — bilinear cost sampling (``encode_flow_token``) and convex upsampling
— are forced to float32 regardless of the compute dtype.

Missing-submodule parts (MemoryDecoder, GMA, SepConvGRU, initialize_flow,
upsample_flow) are re-derived from the reconstruction spec in SURVEY.md §2.9.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp


def coords_grid(batch: int, height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """(B,H,W,2) grid of (x,y)=(u,v) pixel coordinates (initialize_flow)."""
    xs = jax.lax.broadcasted_iota(jnp.int32, (height, width), 1)
    ys = jax.lax.broadcasted_iota(jnp.int32, (height, width), 0)
    grid = jnp.stack([xs, ys], axis=-1).astype(dtype)
    return jnp.broadcast_to(grid[None], (batch, height, width, 2))


def bilinear_sample(img: jnp.ndarray, coords: jnp.ndarray) -> jnp.ndarray:
    """Sample (B,H,W,C) maps at float (B,...,2) (x,y) coords, zero padding.

    fp32 gather + lerp — the reference's grid_sample-based ``encode_flow_token``
    is pinned to fp32 (covhead.py:90-93); low-precision interpolation weights
    visibly bias the recurrent flow refinement.
    """
    img = img.astype(jnp.float32)
    coords = coords.astype(jnp.float32)
    h, w = img.shape[1], img.shape[2]
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    def gather(xi, yi):
        inb = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        batch_idx = jax.lax.broadcasted_iota(jnp.int32, xi.shape, 0)
        vals = img[batch_idx, yi_c, xi_c]
        return vals * inb[..., None]

    v00 = gather(x0, y0)
    v01 = gather(x0 + 1, y0)
    v10 = gather(x0, y0 + 1)
    v11 = gather(x0 + 1, y0 + 1)
    wx = wx[..., None]
    wy = wy[..., None]
    return (
        v00 * (1 - wx) * (1 - wy)
        + v01 * wx * (1 - wy)
        + v10 * (1 - wx) * wy
        + v11 * wx * wy
    )


def encode_flow_token(cost_maps: jnp.ndarray, coords: jnp.ndarray, radius: int = 4) -> jnp.ndarray:
    """Sample a (2r+1)^2 window of each source pixel's cost map around its
    current target coords -> (B, H1, W1, (2r+1)^2), fp32.

    cost_maps: (B, H1*W1, H2, W2); coords: (B, H1, W1, 2).

    TPU-native formulation — sampling as MATMUL, zero gathers: bilinear
    interpolation along each axis is a sparse linear map, materialized as
    per-pixel tri-weight ("tent") matrices W_y (N,H2,k) and W_x (N,W2,k):

        out_i = W_y_i^T @ cost_i @ W_x_i       (two batched einsums, MXU)

    A tent weight relu(1 - |grid - pos|) puts exactly the two bilinear
    coefficients on the neighboring rows/columns, and positions outside the
    map get zero weight — identical semantics to zero-padded grid_sample.
    This replaces the reference's fp32-pinned ``encode_flow_token``
    (covhead.py:90-93): per-pixel windowed gathers are the single most
    TPU-hostile op in the decoder loop; as matmuls the whole 12-iteration
    sampling costs ~2 GFLOP/iter of MXU time.
    """
    b, n1, h2, w2 = cost_maps.shape
    h1, w1 = coords.shape[1], coords.shape[2]
    r = radius
    k = 2 * r + 1
    n = b * n1

    # Sample in the maps' NATIVE dtype with f32 ACCUMULATION: in bf16 mode
    # this halves the dominant per-iteration HBM read (the full cost volume,
    # 12x per forward); the tent coefficients are computed in f32 and rounded
    # once (<=2^-9 relative — far below the bf16 quantization the cost values
    # already carry). fp32 mode is unchanged (maps are f32 natively).
    maps = cost_maps.reshape(n, h2, w2)
    centers = coords.reshape(n, 2).astype(jnp.float32)
    offsets = jnp.arange(-r, r + 1, dtype=jnp.float32)
    pos_y = centers[:, 1:2] + offsets[None]                    # (N, k)
    pos_x = centers[:, 0:1] + offsets[None]

    rows = jax.lax.broadcasted_iota(jnp.float32, (1, h2, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.float32, (1, w2, 1), 1)
    w_y = jnp.maximum(0.0, 1.0 - jnp.abs(rows - pos_y[:, None, :]))   # (N, H2, k)
    w_x = jnp.maximum(0.0, 1.0 - jnp.abs(cols - pos_x[:, None, :]))   # (N, W2, k)

    tmp = jnp.einsum("ihw,iht->itw", maps, w_y.astype(maps.dtype),
                     preferred_element_type=jnp.float32)
    vals = jnp.einsum("itw,iwu->itu", tmp.astype(maps.dtype), w_x.astype(maps.dtype),
                      preferred_element_type=jnp.float32)
    return vals.reshape(b, h1, w1, k * k)


def upsample_convex(flow: jnp.ndarray, mask: jnp.ndarray, factor: int = 8) -> jnp.ndarray:
    """Convex x8 upsampling (fp32): each fine pixel is a softmax-weighted
    combination of the 3x3 coarse neighborhood (``upsample_flow``)."""
    flow = flow.astype(jnp.float32)
    mask = mask.astype(jnp.float32)
    b, h, w, c = flow.shape
    f = factor
    weights = nn.softmax(mask.reshape(b, h, w, f * f, 9), axis=-1)

    scaled = flow * f
    pad = jnp.pad(scaled, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # (B,H,W,9,C) 3x3 neighborhoods via static slices (no gather).
    neigh = jnp.stack(
        [pad[:, dy : dy + h, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=3,
    )
    up = jnp.einsum("bhwkn,bhwnc->bhwkc", weights, neigh)      # (B,H,W,f*f,C)
    up = up.reshape(b, h, w, f, f, c).transpose(0, 1, 3, 2, 4, 5)
    return up.reshape(b, h * f, w * f, c)


class SepConvGRU(nn.Module):
    """Separable 1x5 / 5x1 convolutional GRU (spec: SURVEY.md §2.9; an
    in-tree twin exists at PWCNet/pwc_cov/gru.py:90-120)."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        for axis, kernel in (("h", (1, 5)), ("v", (5, 1))):
            def conv(n):
                return nn.Conv(self.hidden_dim, kernel, padding="SAME",
                               dtype=self.dtype, name=f"{axis}_{n}")
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(conv("z")(hx))
            r = nn.sigmoid(conv("r")(hx))
            q = nn.tanh(conv("q")(jnp.concatenate([r * h, x], axis=-1)))
            h = (1 - z) * h + z * q
        return h


class MotionEncoder(nn.Module):
    """RAFT/GMA motion encoder: (flow, corr) -> 128-d motion features."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        c = nn.relu(nn.Conv(256, (1, 1), dtype=self.dtype, name="convc1")(corr))
        c = nn.relu(nn.Conv(192, (3, 3), padding="SAME", dtype=self.dtype, name="convc2")(c))
        f = nn.relu(nn.Conv(128, (7, 7), padding="SAME", dtype=self.dtype, name="convf1")(flow))
        f = nn.relu(nn.Conv(64, (3, 3), padding="SAME", dtype=self.dtype, name="convf2")(f))
        out = nn.Conv(126, (3, 3), padding="SAME", dtype=self.dtype, name="conv")(
            jnp.concatenate([c, f], axis=-1)
        )
        return jnp.concatenate([nn.relu(out), flow], axis=-1)


class GMAAttention(nn.Module):
    """GMA: self-similarity attention over context features (1 head)."""

    dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, context):
        b, h, w, _ = context.shape
        q = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_q")(context)
        k = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_k")(context)
        q = q.reshape(b, h * w, self.dim) * self.dim**-0.5
        k = k.reshape(b, h * w, self.dim)
        attn = jnp.einsum("bqd,bkd->bqk", q, k, preferred_element_type=jnp.float32)
        return nn.softmax(attn, axis=-1).astype(self.dtype)


class GMAAggregator(nn.Module):
    """GMA: aggregate motion features with the attention map, learned residual."""

    dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, attn, motion):
        b, h, w, _ = motion.shape
        v = nn.Conv(self.dim, (1, 1), dtype=self.dtype, name="to_v")(motion)
        agg = jnp.einsum(
            "bqk,bkd->bqd", attn, v.reshape(b, h * w, self.dim),
            preferred_element_type=jnp.float32,
        ).astype(self.dtype)
        gamma = self.param("gamma", nn.initializers.zeros, (1,))
        return motion + gamma.astype(self.dtype) * agg.reshape(b, h, w, self.dim)


class FlowHead(nn.Module):
    out_dim: int = 2
    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x))
        return nn.Conv(self.out_dim, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(x)


class CovHead(nn.Module):
    """4-conv covariance head (reference: covhead.py:8-21)."""

    hidden: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.hidden, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        x = nn.Conv(self.hidden // 2, (3, 3), padding="SAME", dtype=self.dtype, name="conv2")(nn.relu(x))
        x = nn.Conv(self.hidden // 4, (3, 3), padding="SAME", dtype=self.dtype, name="conv3")(x)
        return nn.Conv(2, (3, 3), padding="SAME", dtype=self.dtype, name="conv4")(nn.relu(x))


class MaskHead(nn.Module):
    """64*9-channel convex-upsample mask head."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Conv(256, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x))
        return nn.Conv(64 * 9, (1, 1), dtype=self.dtype, name="conv2")(x)


class DecoderIteration(nn.Module):
    """One decoder step: cost lookup -> cross-attn -> GMA -> twin GRUs ->
    flow/cov deltas (covhead.py:85-135).

    Mask heads and convex upsampling live OUTSIDE the scan (in
    MemoryCovDecoder): they don't feed the recurrence, so inference applies
    them once to the final nets, and training applies them to the stacked
    per-iteration nets as one batched conv (12 small convs -> 1 large one).
    ``emit_states=True`` (training) makes the scan emit per-iteration
    low-res predictions + net states for that post-pass."""

    query_latent_dim: int = 64
    cost_latent_dim: int = 128
    dtype: Any = jnp.float32
    emit_states: bool = True

    @nn.compact
    def __call__(self, carry, invariants):
        flow_coords1, cov_coords1, flow_net, fcov_net = carry
        coords0 = invariants["coords0"]
        cost_maps = invariants["cost_maps"]
        flow_inp = invariants["flow_inp"]
        attention = invariants["attention"]
        mem_k = invariants["mem_k"]
        mem_v = invariants["mem_v"]
        b, h1, w1, _ = flow_inp.shape
        dt = self.dtype

        flow = (flow_coords1 - coords0).astype(dt)
        cost_forward = encode_flow_token(cost_maps, flow_coords1).astype(dt)

        query = nn.gelu(nn.Conv(128, (1, 1), dtype=dt, name="fte1")(cost_forward))
        query = nn.Conv(self.query_latent_dim, (1, 1), dtype=dt, name="fte2")(query)
        q = nn.Dense(self.cost_latent_dim, dtype=dt, name="dec_q")(
            query.reshape(b * h1 * w1, 1, self.query_latent_dim)
        )
        # Per-pixel 1x8 attention over the latent memory: VPU broadcast-
        # multiply-reduce (a batched 1x8 matmul is all MXU tile padding).
        scores = jnp.sum(
            (q * self.cost_latent_dim**-0.5)[:, :, None, :] * mem_k[:, None, :, :],
            axis=-1,
        ).astype(jnp.float32)
        attn = nn.softmax(scores, axis=-1).astype(dt)      # (n, 1, K)
        agg = jnp.sum(attn[..., None] * mem_v[:, None, :, :], axis=2)
        cost_global = nn.Dense(self.cost_latent_dim, dtype=dt, name="dec_out")(
            agg
        ).reshape(b, h1, w1, self.cost_latent_dim)
        corr = jnp.concatenate([cost_global, cost_forward], axis=-1)

        motion_feat = MotionEncoder(dtype=dt, name="motion_enc")(flow, corr)
        motion_feat_global = GMAAggregator(dtype=dt, name="aggregator")(attention, motion_feat)
        inp_cat = jnp.concatenate([flow_inp, motion_feat, motion_feat_global], axis=-1)

        flow_net = SepConvGRU(128, dtype=dt, name="flow_gru")(flow_net, inp_cat)
        delta_flow = FlowHead(2, dtype=dt, name="flow_head")(flow_net).astype(jnp.float32)

        fcov_net = SepConvGRU(128, dtype=dt, name="cov_gru")(fcov_net, inp_cat)
        delta_cov = CovHead(dtype=dt, name="cov_head")(fcov_net).astype(jnp.float32)

        flow_coords1 = flow_coords1 + delta_flow
        cov_coords1 = cov_coords1 + delta_cov
        if self.emit_states:
            out = (flow_coords1 - coords0, cov_coords1 - coords0, flow_net, fcov_net)
        else:
            out = ()
        return (flow_coords1, cov_coords1, flow_net, fcov_net), out


class MemoryCovDecoder(nn.Module):
    """cost_memory + context + cost_maps -> per-iteration (flow, cov) stacks
    and the final full-res pair (covhead.py:60-140)."""

    decoder_depth: int = 12
    query_latent_dim: int = 64
    cost_latent_dim: int = 128
    dtype: Any = jnp.float32       # decoder compute dtype (bf16 in fast mode)
    inference_only: bool = False   # skip per-iteration upsampling stacks

    @nn.compact
    def __call__(self, cost_memory, context, cost_maps):
        b, h1, w1, _ = context.shape
        dt = self.dtype

        coords0 = coords_grid(b, h1, w1)
        proj = nn.Conv(256, (3, 3), padding="SAME", name="proj")(context)
        flow_net0 = nn.tanh(proj[..., :128]).astype(dt)
        flow_inp = nn.relu(proj[..., 128:]).astype(dt)
        attention = GMAAttention(dtype=dt, name="att")(flow_inp)

        cm = cost_memory.astype(dt)
        mem_k = nn.Dense(self.cost_latent_dim, dtype=dt, name="mem_k")(cm)
        mem_v = nn.Dense(self.cost_latent_dim, dtype=dt, name="mem_v")(cm)

        invariants = {
            "coords0": coords0,
            "cost_maps": cost_maps,
            "flow_inp": flow_inp,
            "attention": attention,
            "mem_k": mem_k,
            "mem_v": mem_v,
        }
        ScannedIteration = nn.scan(
            DecoderIteration,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=nn.broadcast,
            out_axes=0,
            length=self.decoder_depth,
        )
        init = (coords0, coords0, flow_net0, flow_net0)
        carry, ys = ScannedIteration(
            query_latent_dim=self.query_latent_dim,
            cost_latent_dim=self.cost_latent_dim,
            dtype=dt,
            emit_states=not self.inference_only,
            name="iteration",
        )(init, invariants)
        flow_coords1, cov_coords1, flow_net_f, fcov_net_f = carry

        flow_mask_head = MaskHead(dtype=dt, name="flow_mask")
        cov_mask_head = MaskHead(dtype=dt, name="cov_mask")

        if self.inference_only:
            up_mask = 0.25 * flow_mask_head(flow_net_f).astype(jnp.float32)
            cmask = 0.25 * cov_mask_head(fcov_net_f).astype(jnp.float32)
            flow_up = upsample_convex(flow_coords1 - coords0, up_mask)
            cov_up = upsample_convex(cov_coords1 - coords0, cmask)
            return {
                "flow_final": flow_up,
                "cov_final": cov_up,
                "flow_lowres": flow_coords1 - coords0,
                "cov_lowres": cov_coords1 - coords0,
            }

        # Training: one batched mask-head + upsample pass over ALL iterations
        # (depth, B, h, w, C) -> (depth*B, h, w, C).
        flows_lr, covs_lr, flow_nets, fcov_nets = ys
        depth = flows_lr.shape[0]

        def flat(x):
            return x.reshape((depth * b,) + x.shape[2:])

        up_masks = 0.25 * flow_mask_head(flat(flow_nets)).astype(jnp.float32)
        cmasks = 0.25 * cov_mask_head(flat(fcov_nets)).astype(jnp.float32)
        flow_ups = upsample_convex(flat(flows_lr), up_masks)
        cov_ups = upsample_convex(flat(covs_lr), cmasks)
        flow_ups = flow_ups.reshape((depth, b) + flow_ups.shape[1:])
        cov_ups = cov_ups.reshape((depth, b) + cov_ups.shape[1:])
        return {
            "flow_predictions": flow_ups,          # (depth, B, 8H, 8W, 2)
            "cov_predictions": cov_ups,
            "flow_final": flow_ups[-1],
            "cov_final": cov_ups[-1],
            "flow_lowres": flow_coords1 - coords0,
            "cov_lowres": cov_coords1 - coords0,
        }
