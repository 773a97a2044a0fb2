"""Twins-SVT feature/context encoder (flax), 1/8-resolution, 256-channel.

The reference FlowFormer uses the first two stages of timm's Twins-SVT-Large
as both ``fnet`` and ``cnet`` (cfg ``cnet: twins, fnet: twins, pretrain``,
Config/Train/FlowFormerCovKITTIthings.yaml:49-50; consumed through the missing
submodule's ``core.transformer.FlowFormer`` — interface reconstructed in
SURVEY.md §2.9). Architecture re-implemented TPU-first in flax.linen,
channel-last NHWC:

* stage 1: 4x4 patch embed -> dim 128, 2 blocks (LSA 7x7 window, GSA sr 8)
* stage 2: 2x2 patch embed -> dim 256, 2 blocks (LSA 7x7 window, GSA sr 4)
* PEG depthwise-conv positional encoding after the first block of each stage.

Output: (B, H/8, W/8, 256). All attention is batched dense matmul (MXU);
window partitioning uses reshapes only (no gathers).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp


class Mlp(nn.Module):
    hidden: int
    out: int
    dtype: Any = None   # compute dtype (params stay fp32)

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, dtype=self.dtype)(x)
        x = nn.gelu(x)
        return nn.Dense(self.out, dtype=self.dtype)(x)


class LocallyGroupedAttention(nn.Module):
    """Windowed self-attention — Twins-SVT LSA.

    Window 8 (not the torch default 7): 8 divides every stage size of the
    /8-aligned inputs this model sees, which removes the pad+mask branch from
    every block AND aligns windows to TPU sublane tiling. No pretrained
    weights constrain the choice (SURVEY.md §2.9: weights must be retrained)."""

    dim: int
    num_heads: int
    window: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        # NOTE: an "optimized" transpose-free 8-axis einsum formulation was
        # tried and MEASURED SLOWER on v5e (twins 13.8 -> 24.2 ms @480x640:
        # XLA lowers the multi-free-dim dot_general worse than these explicit
        # transposes). Keep the transpose formulation.
        b, h, w, c = x.shape
        ws = self.window
        pad_h = (-h) % ws
        pad_w = (-w) % ws
        x_p = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
        hp, wp = h + pad_h, w + pad_w
        nh, nw = hp // ws, wp // ws

        qkv = nn.Dense(3 * self.dim, dtype=self.dtype, name="qkv")(x_p)
        qkv = qkv.reshape(b, nh, ws, nw, ws, 3, self.num_heads, c // self.num_heads)
        # (3, b, nh, nw, heads, ws*ws, hd)
        qkv = qkv.transpose(5, 0, 1, 3, 6, 2, 4, 7).reshape(
            3, b, nh, nw, self.num_heads, ws * ws, c // self.num_heads
        )
        q, k, v = qkv[0], qkv[1], qkv[2]
        scale = (c // self.num_heads) ** -0.5
        attn = jnp.einsum("...qd,...kd->...qk", q * scale, k)
        # Mask padded positions out of the softmax.
        if pad_h or pad_w:
            row = jnp.arange(hp).reshape(nh, ws)
            col = jnp.arange(wp).reshape(nw, ws)
            valid = (row[:, None, :, None] < h) & (col[None, :, None, :] < w)
            valid = valid.reshape(nh, nw, ws * ws)
            attn = jnp.where(valid[None, :, :, None, None, :], attn, -1e9)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("...qk,...kd->...qd", attn, v)
        out = out.reshape(b, nh, nw, self.num_heads, ws, ws, c // self.num_heads)
        out = out.transpose(0, 1, 4, 2, 5, 3, 6).reshape(b, hp, wp, c)
        out = out[:, :h, :w]
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class GlobalSubsampledAttention(nn.Module):
    """Global attention with spatially sub-sampled K/V — Twins-SVT GSA."""

    dim: int
    num_heads: int
    sr_ratio: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        b, h, w, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(self.dim, dtype=self.dtype, name="q")(x).reshape(b, h * w, self.num_heads, hd)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio), dtype=self.dtype, name="sr",
            )(x)
            kv_in = nn.LayerNorm(name="sr_norm")(kv_in)
        hk, wk = kv_in.shape[1], kv_in.shape[2]
        kv = nn.Dense(2 * self.dim, dtype=self.dtype, name="kv")(kv_in).reshape(b, hk * wk, 2, self.num_heads, hd)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q * hd**-0.5, k)
        attn = nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, c)
        return nn.Dense(self.dim, dtype=self.dtype, name="proj")(out)


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: int
    use_window: bool
    sr_ratio: int = 1
    window: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        if self.use_window:
            attn = LocallyGroupedAttention(self.dim, self.num_heads, self.window,
                                           dtype=self.dtype, name="attn")
        else:
            attn = GlobalSubsampledAttention(self.dim, self.num_heads, self.sr_ratio,
                                             dtype=self.dtype, name="attn")
        # LayerNorms stay fp32 (cheap, precision-sensitive); the dtype-cast
        # happens inside the attention/MLP projections.
        x = x + attn(nn.LayerNorm(name="norm1")(x)).astype(x.dtype)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, dtype=self.dtype,
                    name="mlp")(nn.LayerNorm(name="norm2")(x)).astype(x.dtype)
        return x


class PosConv(nn.Module):
    """PEG: depthwise 3x3 conv positional encoding (Twins)."""

    dim: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        return x + nn.Conv(
            self.dim, (3, 3), padding="SAME", feature_group_count=self.dim,
            dtype=self.dtype, name="proj"
        )(x).astype(x.dtype)


class TwinsSVT(nn.Module):
    """First-two-stage Twins-SVT encoder -> (B, H/8, W/8, out_dim)."""

    embed_dims: Sequence[int] = (128, 256)
    depths: Sequence[int] = (2, 2)
    num_heads: Sequence[int] = (4, 8)
    sr_ratios: Sequence[int] = (8, 4)
    mlp_ratios: Sequence[int] = (4, 4)
    patch_sizes: Sequence[int] = (4, 2)
    window: int = 8
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        dt = self.dtype or x.dtype
        for s, dim in enumerate(self.embed_dims):
            p = self.patch_sizes[s]
            x = nn.Conv(dim, (p, p), strides=(p, p), dtype=self.dtype,
                        name=f"patch_embed{s}")(x)
            x = nn.LayerNorm(name=f"embed_norm{s}")(x).astype(dt)
            for i in range(self.depths[s]):
                x = Block(
                    dim, self.num_heads[s], self.mlp_ratios[s],
                    use_window=(i % 2 == 0), sr_ratio=self.sr_ratios[s],
                    window=self.window, dtype=self.dtype,
                    name=f"stage{s}_block{i}",
                )(x)
                if i == 0:
                    x = PosConv(dim, dtype=self.dtype, name=f"peg{s}")(x)
            x = nn.LayerNorm(name=f"stage_norm{s}")(x).astype(dt)
        return x
