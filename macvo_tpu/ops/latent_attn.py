"""Fused latent cross-attention for the cost perceiver's input stage.

The FlowFormer cost perceiver starts by letting 8 learned latent tokens
cross-attend each source pixel's ~80 cost-patch tokens (reference: missing
submodule's CostPerceiverEncoder, interface per SURVEY.md §2.9; consumed at
models/flowformer/encoder.py). As separate XLA ops this stage is
bandwidth-bound: tokens -> input_proj -> k/v projections materialize three
(B*H1*W1, T, 128) intermediates in HBM (~750 MB of traffic at 480x640).

This Pallas kernel fuses the whole stage so only the 64-d tokens are read
from HBM and only the (8, 128) per-pixel output is written:

  * ``input_proj`` is folded into the k/v projections (two chained Dense
    layers are one matmul: W' = W_proj @ W_kv),
  * the query projection of the latents is shared by every pixel (latents
    are a learned constant), so q is computed ONCE outside the kernel,
  * k, v, scores, softmax and the output projection all live in VMEM.

Layout: grid over pixel blocks (BP pixels/program). Per program the k/v
projections are ONE (BP*T, 64) x (64, 128) MXU matmul; scores are one
(BP*T, 128) x (128, 8) matmul against the shared transposed queries — the
(bp, t, nq) score layout makes softmax (over t) and the attention-times-v
contraction transpose-free.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(tokens_ref, wk_ref, bk_ref, wv_ref, bv_ref, qt_ref, wp_ref,
            bias_ref, out_ref):
    bp, t, d_in = tokens_ref.shape
    d = wk_ref.shape[1]
    nq = qt_ref.shape[1]

    tok = tokens_ref[:].reshape(bp * t, d_in)
    k = jnp.dot(tok, wk_ref[:], preferred_element_type=jnp.float32) + bk_ref[0]
    v = jnp.dot(tok, wv_ref[:], preferred_element_type=jnp.float32) + bv_ref[0]

    # Shared-query scores: ONE (bp*t, d) x (d, nq) matmul; qt is pre-scaled.
    s = jnp.dot(k, qt_ref[:], preferred_element_type=jnp.float32)
    a = jax.nn.softmax(s.reshape(bp, t, nq), axis=1)

    # attn (bp, t, nq) x v (bp, t, d) -> (bp, nq, d), contraction over t.
    o = jax.lax.dot_general(
        a, v.reshape(bp, t, d),
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    o = jnp.dot(o.reshape(bp * nq, d), wp_ref[:],
                preferred_element_type=jnp.float32)
    out_ref[:] = (o.reshape(bp, nq, d) + bias_ref[:]).astype(out_ref.dtype)


@partial(jax.jit, static_argnames=("block_pixels", "chunk_pixels", "interpret"))
def latent_cross_attention(tokens: jnp.ndarray, wk: jnp.ndarray, bk: jnp.ndarray,
                           wv: jnp.ndarray, bv: jnp.ndarray, q: jnp.ndarray,
                           wp: jnp.ndarray, bias: jnp.ndarray,
                           block_pixels: int = 128, chunk_pixels: int = 2048,
                           interpret: bool = False):
    """tokens (N, T, D_in); wk/wv (D_in, D) with input_proj folded in;
    bk/bv (D,); q (Q, D) query projection of the latents (unscaled); wp
    (D, D) output projection; bias (Q, D) = proj bias + latents (the
    residual). Returns (N, Q, D) in tokens.dtype.

    ``chunk_pixels`` caps the size of any single pallas_call output: XLA's
    buffer assignment may scope a custom-call result into VMEM for consumer
    locality, and one (N, Q, D) buffer at N = 6400 (640x640 inputs) blows the
    16 MB scoped-vmem limit. Chunks are processed by a lax.map (sequential,
    one custom call per chunk) so every result buffer stays well under it.
    Measured on v5e: the scoped allocation is ~2.9x the raw bf16 result bytes
    (tiling + double buffering), so 2048 pixels ≈ 12 M of the 16 M budget.
    """
    n, t, d_in = tokens.shape
    nq, d = q.shape
    bp = min(block_pixels, n)
    # Scoped-VMEM budgets are DTYPE-AWARE: the measured-safe caps below were
    # taken with bf16 tokens/outputs; f32 doubles both the token block and the
    # chunk result buffer XLA scopes into VMEM (measured: a 2048-pixel f32
    # chunk scoped 24.85 M > the 16 M limit under precision=HIGHEST fusion,
    # while the bf16 equivalent is ~12.4 M). Halve both caps for >=4-byte
    # dtypes instead of leaving the compile to die on the limit.
    wide = jnp.dtype(tokens.dtype).itemsize >= 4
    row_budget = (64 if wide else 128) * 80
    if wide:
        chunk_pixels = min(chunk_pixels, 1024)
    # The kernel materializes k/v as (bp*t, d) fp32 in VMEM; cap the row count
    # at the measured-safe working set so larger patch-token counts (t=100 at
    # 640x640) shrink the pixel block instead of blowing the 16 M limit.
    while bp > 8 and bp * t > row_budget:
        bp //= 2
    if bp * t > row_budget:
        # Even the minimum pixel block exceeds the measured-safe VMEM working
        # set (t > 1280 tokens) — fall back to the XLA twin instead of an
        # opaque on-chip OOM (ADVICE r3).
        return latent_cross_attention_xla(tokens, wk, bk, wv, bv, q, wp, bias)
    qt = (q.astype(jnp.float32) * jnp.float32(d) ** -0.5).T  # (D, Q)
    bk2, bv2 = bk.reshape(1, d), bv.reshape(1, d)

    def run(chunk):
        m = chunk.shape[0]
        return pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct((m, nq, d), chunk.dtype),
            grid=(m // bp,),
            in_specs=[
                pl.BlockSpec((bp, t, d_in), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d_in, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d_in, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, nq), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((d, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nq, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((bp, nq, d), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            interpret=interpret,
        )(chunk, wk, bk2, wv, bv2, qt, wp, bias)

    chunk = max(bp, (min(chunk_pixels, n) // bp) * bp)
    pad = (-n) % chunk
    if pad:
        tokens = jnp.pad(tokens, ((0, pad), (0, 0), (0, 0)))
    n_chunks = tokens.shape[0] // chunk
    if n_chunks == 1:
        out = run(tokens)
    else:
        out = jax.lax.map(run, tokens.reshape(n_chunks, chunk, t, d_in))
        out = out.reshape(n_chunks * chunk, nq, d)
    return out[:n]


def latent_cross_attention_xla(tokens, wk, bk, wv, bv, q, wp, bias):
    """XLA twin (same folded-weight math) for CPU runs and verification."""
    k = jnp.einsum("ntd,de->nte", tokens.astype(jnp.float32), wk.astype(jnp.float32)) + bk
    v = jnp.einsum("ntd,de->nte", tokens.astype(jnp.float32), wv.astype(jnp.float32)) + bv
    scale = jnp.float32(q.shape[1]) ** -0.5
    s = jnp.einsum("qe,nte->nqt", q.astype(jnp.float32) * scale, k)
    a = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("nqt,nte->nqe", a, v)
    o = jnp.einsum("nqe,ef->nqf", o, wp.astype(jnp.float32))
    return (o + bias).astype(tokens.dtype)
