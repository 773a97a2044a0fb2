"""FlowFormer memory encoder: all-pairs cost volume + latent cost tokenizer.

Re-derivation of the missing submodule's ``MemoryEncoder`` /
``CostPerceiverEncoder`` (interface + hyperparameters reconstructed in
SURVEY.md §2.9 from Config/Train/FlowFormerCovKITTIthings.yaml:17-56 and
every call site). Pipeline per the FlowFormer (ECCV'22) architecture:

1. all-pairs correlation between 1/8-res features: ONE large batched matmul
   — this is the BASELINE "4D correlation volume" kernel, and on TPU the
   MXU-native formulation IS the matmul; no hand-written kernel can beat it.
2. per-source-pixel cost-map patchification (8x8 conv) -> 64-d tokens,
3. 8 latent tokens (128-d) cross-attend the patch tokens,
4. ``encoder_depth``=3 alternating intra-cost-map self-attention and
   vertical inter-cost-map attention (with 64-d context injection,
   cfg ``vert_c_dim``).

Outputs: ``cost_memory (B*H1*W1, K=8, 128)`` and ``cost_maps
(B, H1*W1, H2, W2)`` for the decoder's direct cost lookups.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .twins import Mlp


def all_pairs_correlation(feat1: jnp.ndarray, feat2: jnp.ndarray) -> jnp.ndarray:
    """(B,H1,W1,C) x (B,H2,W2,C) -> cost maps (B, H1*W1, H2, W2), scaled by
    1/sqrt(C) (FlowFormer convention)."""
    b, h1, w1, c = feat1.shape
    h2, w2 = feat2.shape[1], feat2.shape[2]
    f1 = feat1.reshape(b, h1 * w1, c)
    f2 = feat2.reshape(b, h2 * w2, c)
    cost = jnp.einsum("bnc,bmc->bnm", f1, f2, preferred_element_type=jnp.float32)
    cost = cost / jnp.sqrt(jnp.asarray(c, cost.dtype))
    return cost.reshape(b, h1 * w1, h2, w2).astype(feat1.dtype)


def tiny_attention(q, k, v, scale: float):
    """Attention for TINY sequence lengths as VPU broadcast-multiply-reduce.

    q/k/v: (..., Q|K, H, D). A batched matmul with Q,K of 8 or 80 occupies a
    few percent of an MXU tile per batch element (measured: the perceiver's
    8-token intra attention alone cost 5.8 ms/layer at 480x640); an
    elementwise product fused into its reduction runs on the VPU at full
    width and is bound only by reading q/k/v once.
    """
    qh = jnp.moveaxis(q, -2, -3) * scale          # (..., H, Q, D)
    kh = jnp.moveaxis(k, -2, -3)                  # (..., H, K, D)
    vh = jnp.moveaxis(v, -2, -3)
    scores = jnp.sum(qh[..., :, None, :] * kh[..., None, :, :], axis=-1)
    attn = jax.nn.softmax(scores, axis=-1)        # (..., H, Q, K)
    # attn (..., H, Q, K) x vh (..., H, K, D) -> (..., H, Q, D)
    out = jnp.sum(attn[..., :, :, None] * vh[..., None, :, :], axis=-2)
    return jnp.moveaxis(out, -3, -2)              # back to (..., Q, H, D)


class CrossAttention(nn.Module):
    dim: int
    num_heads: int = 1
    # Below this q_len*k_len the MXU formulation is all padding; use the VPU.
    # Measured on v5e @480x640: 8x8 intra attention 5.8 -> 1.1 ms/layer, but
    # 8x80 got SLOWER (XLA materializes the (.., 8, 80, D) product) — so the
    # cutoff sits between 64 and 640.
    tiny_threshold: int = 128
    dtype: Any = None

    def setup(self):
        # setup-style (attribute name == param name, identical tree to the
        # previous compact form) so the fused-kernel path can address the
        # projection layers individually (see CostPerceiverEncoder).
        self.q = nn.Dense(self.dim, dtype=self.dtype)
        self.k = nn.Dense(self.dim, dtype=self.dtype)
        self.v = nn.Dense(self.dim, dtype=self.dtype)
        self.proj = nn.Dense(self.dim, dtype=self.dtype)

    def __call__(self, q_in, kv_in):
        hd = self.dim // self.num_heads
        q = self.q(q_in)
        k = self.k(kv_in)
        v = self.v(kv_in)

        def split(x):
            return x.reshape(x.shape[:-1] + (self.num_heads, hd))

        q_len, k_len = q_in.shape[-2], kv_in.shape[-2]
        if q_len * k_len <= self.tiny_threshold:
            out = tiny_attention(split(q), split(k), split(v), hd**-0.5)
        else:
            # Transpose-first formulation: move heads ahead of the sequence
            # axis and contract with plain "...qd,...kd->...qk" — XLA lowers
            # the multi-free-dim "...qhd,...khd->...hqk" dot_general far
            # worse on TPU (same finding as the Twins LSA, twins.py:52-55).
            qh = jnp.moveaxis(split(q), -2, -3) * hd**-0.5   # (..., H, Q, D)
            kh = jnp.moveaxis(split(k), -2, -3)
            vh = jnp.moveaxis(split(v), -2, -3)
            attn = jnp.einsum("...qd,...kd->...qk", qh, kh)
            attn = nn.softmax(attn, axis=-1)
            out = jnp.moveaxis(jnp.einsum("...qk,...kd->...qd", attn, vh), -3, -2)
        out = out.reshape(out.shape[:-2] + (self.dim,))
        return self.proj(out)


class SelfAttentionLayer(nn.Module):
    """Pre-norm transformer layer over the latent-token axis."""

    dim: int
    num_heads: int = 8
    mlp_ratio: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        h = nn.LayerNorm(name="norm1")(x)
        x = x + CrossAttention(self.dim, self.num_heads, dtype=self.dtype,
                               name="attn")(h, h).astype(x.dtype)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, dtype=self.dtype,
                    name="mlp")(nn.LayerNorm(name="norm2")(x)).astype(x.dtype)
        return x


class VerticalAttentionLayer(nn.Module):
    """Attention along the source image's vertical axis, per latent token,
    with projected context injection (cfg ``vert_c_dim``)."""

    dim: int
    vert_c_dim: int
    num_heads: int = 8
    mlp_ratio: int = 4
    dtype: Any = None

    @nn.compact
    def __call__(self, x, context):
        # x: (B, H1, W1, K, D); context: (B, H1, W1, C_ctx)
        b, h1, w1, k, d = x.shape
        ctx = nn.Dense(self.vert_c_dim, dtype=self.dtype, name="ctx_proj")(context)
        ctx = jnp.broadcast_to(ctx[:, :, :, None, :], (b, h1, w1, k, self.vert_c_dim))
        h_in = jnp.concatenate(
            [nn.LayerNorm(name="norm1")(x).astype(ctx.dtype), ctx], axis=-1)
        # Batch over (B, W1, K); sequence = H1 (vertical).
        h_seq = h_in.transpose(0, 2, 3, 1, 4).reshape(b * w1 * k, h1, d + self.vert_c_dim)
        attn_out = CrossAttention(self.dim, self.num_heads, dtype=self.dtype, name="attn")(h_seq, h_seq)
        attn_out = attn_out.reshape(b, w1, k, h1, d).transpose(0, 3, 1, 2, 4)
        x = x + attn_out.astype(x.dtype)
        x = x + Mlp(self.dim * self.mlp_ratio, self.dim, dtype=self.dtype,
                    name="mlp")(nn.LayerNorm(name="norm2")(x)).astype(x.dtype)
        return x


class CostPerceiverEncoder(nn.Module):
    """Cost maps -> latent cost memory (FlowFormer latentcostformer encoder).

    ``fused_input=True`` (inference on TPU) runs the input stage — input
    projection + latent cross-attention — as ONE Pallas kernel
    (ops/latent_attn.py): the (B*H1*W1, T, 128) k/v intermediates never
    touch HBM. Same parameters, same math (the chained input_proj -> k/v
    Dense pairs are folded into single matmuls)."""

    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    encoder_depth: int = 3
    patch_size: int = 8
    vert_c_dim: int = 64
    fused_input: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, cost_maps: jnp.ndarray, context: jnp.ndarray) -> jnp.ndarray:
        # cost_maps: (B, H1*W1, H2, W2); context: (B, H1, W1, C)
        b, n1, h2, w2 = cost_maps.shape
        h1, w1 = context.shape[1], context.shape[2]
        assert n1 == h1 * w1

        p = self.patch_size
        # Patchify as space-to-depth + Dense: a C_in=1 strided conv is the
        # worst case for the MXU (im2col over one channel); an unfold-reshape
        # feeds one large (N_tok, p*p) x (p*p, D) matmul instead.
        pad_h = (-h2) % p
        pad_w = (-w2) % p
        x = cost_maps.reshape(b * n1, h2, w2)
        if pad_h or pad_w:
            x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w)))
        th, tw = (h2 + pad_h) // p, (w2 + pad_w) // p
        n_tok = th * tw
        x = x.reshape(b * n1, th, p, tw, p).transpose(0, 1, 3, 2, 4)
        patches = x.reshape(b * n1, n_tok, p * p)
        tokens = nn.Dense(self.cost_latent_input_dim, dtype=self.dtype, name="patch_embed")(patches)
        # Linear positional encoding (cfg ``pe: linear``): a learned projection
        # of normalized patch-center coordinates — resolution-independent, so
        # one parameter set serves any input size (unlike a per-token table).
        ys = (jnp.arange(th, dtype=jnp.float32) + 0.5) / th
        xs = (jnp.arange(tw, dtype=jnp.float32) + 0.5) / tw
        coords = jnp.stack(jnp.meshgrid(xs, ys, indexing="xy"), axis=-1).reshape(n_tok, 2)
        pos = nn.Dense(self.cost_latent_input_dim, dtype=self.dtype, name="pos_proj")(2.0 * coords - 1.0)
        tokens = tokens + pos[None].astype(tokens.dtype)

        latents = self.param(
            "latents", nn.initializers.normal(0.02),
            (1, self.cost_latent_token_num, self.cost_latent_dim),
        )
        input_proj = nn.Dense(self.cost_latent_dim, dtype=self.dtype, name="input_proj")
        input_attn = CrossAttention(self.cost_latent_dim, num_heads=1, dtype=self.dtype, name="input_attn")
        if self.fused_input:
            from ...ops.latent_attn import latent_cross_attention

            dim, d_in = self.cost_latent_dim, self.cost_latent_input_dim
            # Extract projection weights by probing the layers with identity /
            # zero inputs (exact: y = xW + b), then fold input_proj into k/v.
            eye_in = jnp.eye(d_in, dtype=jnp.float32)
            eye_d = jnp.eye(dim, dtype=jnp.float32)
            zero_in = jnp.zeros((1, d_in), jnp.float32)
            zero_d = jnp.zeros((1, dim), jnp.float32)
            b2 = input_proj(zero_in)
            w2 = input_proj(eye_in) - b2
            bk = input_attn.k(zero_d)
            wk = input_attn.k(eye_d) - bk
            bv = input_attn.v(zero_d)
            wv = input_attn.v(eye_d) - bv
            bp_ = input_attn.proj(zero_d)
            wp = input_attn.proj(eye_d) - bp_
            q_eff = input_attn.q(latents[0].astype(jnp.float32))      # (Q, dim)
            x = latent_cross_attention(
                tokens,
                (w2 @ wk).astype(tokens.dtype), (b2 @ wk + bk)[0],
                (w2 @ wv).astype(tokens.dtype), (b2 @ wv + bv)[0],
                q_eff, wp.astype(jnp.float32),
                (latents[0].astype(jnp.float32) + bp_),
            ).astype(tokens.dtype)
        else:
            latents_b = jnp.broadcast_to(
                latents, (b * n1, self.cost_latent_token_num, self.cost_latent_dim)
            )
            tokens_proj = input_proj(tokens)
            x = latents_b.astype(tokens.dtype) + input_attn(latents_b, tokens_proj)

        for i in range(self.encoder_depth):
            x = SelfAttentionLayer(self.cost_latent_dim, dtype=self.dtype,
                                   name=f"intra{i}")(x)
            grid = x.reshape(b, h1, w1, self.cost_latent_token_num, self.cost_latent_dim)
            grid = VerticalAttentionLayer(
                self.cost_latent_dim, self.vert_c_dim, dtype=self.dtype,
                name=f"inter{i}"
            )(grid, context)
            x = grid.reshape(b * n1, self.cost_latent_token_num, self.cost_latent_dim)
        return x


class MemoryEncoder(nn.Module):
    """feat1, feat2, context -> (cost_memory, cost_maps)."""

    cost_latent_input_dim: int = 64
    cost_latent_token_num: int = 8
    cost_latent_dim: int = 128
    encoder_depth: int = 3
    patch_size: int = 8
    vert_c_dim: int = 64
    fused_input: bool = False
    dtype: Any = None

    @nn.compact
    def __call__(self, feat1, feat2, context):
        cost_maps = all_pairs_correlation(feat1, feat2)
        cost_memory = CostPerceiverEncoder(
            cost_latent_input_dim=self.cost_latent_input_dim,
            cost_latent_token_num=self.cost_latent_token_num,
            cost_latent_dim=self.cost_latent_dim,
            encoder_depth=self.encoder_depth,
            patch_size=self.patch_size,
            vert_c_dim=self.vert_c_dim,
            fused_input=self.fused_input,
            dtype=self.dtype,
            name="perceiver",
        )(cost_maps, context)
        return cost_memory, cost_maps
