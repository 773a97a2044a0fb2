"""Per-stage device timing of the FlowFormerCov frontend at 480x640 batch 2.

Measurement method: each stage is wrapped in a ``lax.scan`` that runs it K
times with a data dependency, ending in one scalar reduction fetched with
``np.asarray`` — wall(K2) - wall(K1) divided by (K2-K1) isolates the pure
device cost per stage, independent of dispatch/link/sync overheads (the
remote axon backend acks ``block_until_ready`` before compute finishes, so
naive timing loops measure nothing).

    PYTHONPATH=.:$PYTHONPATH python scripts/profile_frontend.py
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/macvo_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _perturb(tree, eps):
    return jax.tree.map(
        lambda x: x + jnp.asarray(eps, x.dtype)
        if jnp.issubdtype(x.dtype, jnp.floating) else x,
        tree,
    )


def scan_time(stage_fn, carry0, k_lo=1, k_hi=5, reps=3, name=""):
    """stage_fn: carry -> carry (same pytree structure). Returns ms/stage."""

    def make(k):
        @jax.jit
        def run(c):
            def body(c0, _):
                c1 = _perturb(stage_fn(c0), 1e-6)
                c1 = jax.tree.map(lambda a, b: a.astype(b.dtype), c1, c0)
                return c1, ()
            c, _ = jax.lax.scan(body, c, length=k)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(c))
        return run

    f_lo, f_hi = make(k_lo), make(k_hi)
    # warm (compile + one fetch each)
    np.asarray(f_lo(carry0)); np.asarray(f_hi(carry0))

    def meas(f):
        best = float("inf")
        for r in range(reps):
            c = _perturb(carry0, (r + 1) * 1e-5)
            jax.block_until_ready(c)
            t0 = time.perf_counter()
            np.asarray(f(c))
            best = min(best, time.perf_counter() - t0)
        return best

    t_lo, t_hi = meas(f_lo), meas(f_hi)
    ms = (t_hi - t_lo) / (k_hi - k_lo) * 1e3
    print(f"{name:<36s} {ms:8.2f} ms   (wall k{k_lo}={t_lo*1e3:.1f} k{k_hi}={t_hi*1e3:.1f})",
          flush=True)
    return ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--dtype", default="bf16")
    ap.add_argument("--stages", type=str, default="all",
                    help="comma list: twins,corr,perceiver,decoder,eft,full")
    args = ap.parse_args()
    stages = args.stages.split(",") if args.stages != "all" else \
        ["twins", "corr", "perceiver", "decoder", "eft", "full"]

    from macvo_tpu.models.flowformer import FlowFormerConfig, FlowFormerCov
    from macvo_tpu.models.flowformer.decoder import MemoryCovDecoder, encode_flow_token
    from macvo_tpu.models.flowformer.encoder import MemoryEncoder, all_pairs_correlation
    from macvo_tpu.models.flowformer.twins import TwinsSVT

    H, W, B = args.height, args.width, 2
    h1, w1 = H // 8, W // 8
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    img = jax.random.uniform(key, (B, H, W, 3), dt)
    img4 = jnp.concatenate([img, img], axis=0)
    feat = jax.random.normal(key, (B, h1, w1, 256), dt)
    ctx = jax.random.normal(key, (B, h1, w1, 256), dt)

    if "twins" in stages:
        twins = TwinsSVT(dtype=dt)
        tw_params = twins.init(key, img[:1])["params"]

        def tw2(x):
            out = twins.apply({"params": tw_params}, x)
            return x + jnp.mean(out) * 1e-6
        scan_time(tw2, img, name=f"twins batch{B} (cnet pass)")

        def tw4(x):
            out = twins.apply({"params": tw_params}, x)
            return x + jnp.mean(out) * 1e-6
        scan_time(tw4, img4, name=f"twins batch{2*B} (fnet pass)")

    if "corr" in stages:
        def corr(f):
            c = all_pairs_correlation(f, f)
            return f + jnp.mean(c).astype(f.dtype) * 1e-6
        scan_time(corr, feat, name="all-pairs correlation")

    if "perceiver" in stages:
        menc = MemoryEncoder(dtype=dt, fused_input=jax.default_backend() == "tpu")
        me_params = menc.init(key, feat, feat, ctx)["params"]

        def percv(f):
            mem, _ = menc.apply({"params": me_params}, f, f, ctx)
            return f + jnp.mean(mem).astype(f.dtype) * 1e-6
        scan_time(percv, feat, name="memory encoder (corr+perceiver)")

    if "decoder" in stages or "eft" in stages:
        cost_memory = jax.random.normal(key, (B * h1 * w1, 8, 128), dt)
        cost_maps = jax.random.normal(key, (B, h1 * w1, h1, w1), jnp.float32)
        ctx32 = ctx.astype(jnp.float32)

    if "decoder" in stages:
        dec = MemoryCovDecoder(decoder_depth=12, dtype=dt, inference_only=True)
        dec_params = dec.init(key, cost_memory, ctx32, cost_maps)["params"]

        def decf(c):
            out = dec.apply({"params": dec_params}, cost_memory, c, cost_maps)
            return c + jnp.mean(out["flow_final"]) * 1e-6
        scan_time(decf, ctx32, k_hi=3, name="decoder scan x12")

    if "eft" in stages:
        coords = jax.random.uniform(key, (B, h1, w1, 2), jnp.float32) * 32

        def eft(c):
            v = encode_flow_token(cost_maps, c)
            return c + v[..., :2] * 1e-6
        scan_time(eft, coords, k_lo=2, k_hi=12, name="encode_flow_token x1")

    if "perceiver_parts" in stages:
        import flax.linen as nn
        from macvo_tpu.models.flowformer.encoder import (
            CrossAttention, SelfAttentionLayer, VerticalAttentionLayer,
        )

        n1 = h1 * w1
        tokens = jax.random.normal(key, (B * n1, 80, 64), dt)
        latents = jax.random.normal(key, (B * n1, 8, 128), dt)
        grid = jax.random.normal(key, (B, h1, w1, 8, 128), dt)

        class InputAttn(nn.Module):
            @nn.compact
            def __call__(self, lat, tok):
                tp = nn.Dense(128, name="input_proj")(tok)
                return lat + CrossAttention(128, 1, name="input_attn")(lat, tp)

        m1 = InputAttn()
        p1 = m1.init(key, latents, tokens)["params"]

        def input_attn(l):
            return m1.apply({"params": p1}, l, tokens)
        scan_time(input_attn, latents, name="perceiver: input cross-attn")

        m2 = SelfAttentionLayer(128)
        p2 = m2.init(key, latents)["params"]

        def intra(l):
            return m2.apply({"params": p2}, l)
        scan_time(intra, latents, name="perceiver: intra layer x1")

        m3 = VerticalAttentionLayer(128, 64)
        p3 = m3.init(key, grid, ctx)["params"]

        def vert(g):
            return m3.apply({"params": p3}, g, ctx)
        scan_time(vert, grid, name="perceiver: vertical layer x1")

        cost_maps2 = jax.random.normal(key, (B, n1, h1, w1), dt)

        class Patchify(nn.Module):
            @nn.compact
            def __call__(self, cm):
                b, n, hh, ww = cm.shape
                p = 8
                pad_h, pad_w = (-hh) % p, (-ww) % p
                x = cm.reshape(b * n, hh, ww)
                x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w)))
                th, tw = (hh + pad_h) // p, (ww + pad_w) // p
                x = x.reshape(b * n, th, p, tw, p).transpose(0, 1, 3, 2, 4)
                patches = x.reshape(b * n, th * tw, p * p)
                return nn.Dense(64, name="patch_embed")(patches)

        m4 = Patchify()
        p4 = m4.init(key, cost_maps2)["params"]

        def patch(cm):
            t = m4.apply({"params": p4}, cm)
            return cm + jnp.mean(t).astype(cm.dtype) * 1e-6
        scan_time(patch, cost_maps2, name="perceiver: patchify+embed")

    if "full" in stages:
        cfg = FlowFormerConfig(encoder_dtype=args.dtype, decoder_dtype=args.dtype,
                               inference_only=True)
        model = FlowFormerCov(cfg)
        imgf = img.astype(jnp.float32)
        params = model.init(key, imgf[:1], imgf[:1])["params"]

        def full(x):
            out = model.apply({"params": params}, x, x)
            return x + jnp.mean(out["flow_final"]).astype(x.dtype) * 1e-6
        scan_time(full, imgf, k_hi=3, name="FULL forward (pair batch2)")


if __name__ == "__main__":
    main()
