"""Per-stage device timing of the FlowFormerCov frontend at 480x640 batch 2.

Times each pipeline stage as its own jitted function (block_until_ready
around a timed loop), localizing the frontend's device compute budget:
Twins encoders, all-pairs correlation, cost perceiver, decoder scan, plus
isolated decoder sub-ops (encode_flow_token, GRUs). Run on the TPU chip:

    python scripts/profile_frontend.py [--height 480 --width 640 --iters 10]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/macvo_jax_cache")

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def timeit(fn, *args, iters=10, name="", vary=0):
    """Time fn over ``iters`` calls. ``vary``: index of an arg to perturb per
    call (distinct input buffers defeat any runtime memoization of identical
    dispatches — observed with the remote axon backend)."""
    variants = []
    for i in range(iters):
        a = list(args)
        a[vary] = jax.tree.map(
            lambda x: x + jnp.asarray(i * 1e-6, x.dtype) if jnp.issubdtype(x.dtype, jnp.floating) else x,
            a[vary])
        variants.append(tuple(a))
    jax.block_until_ready(variants)
    out = fn(*variants[0])
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    outs = [fn(*v) for v in variants]
    jax.block_until_ready(outs)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:<32s} {dt:8.2f} ms", flush=True)
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--dtype", default="bf16")
    args = ap.parse_args()

    from macvo_tpu.models.flowformer import FlowFormerConfig, FlowFormerCov
    from macvo_tpu.models.flowformer.decoder import MemoryCovDecoder, encode_flow_token
    from macvo_tpu.models.flowformer.encoder import MemoryEncoder, all_pairs_correlation
    from macvo_tpu.models.flowformer.twins import TwinsSVT

    H, W, B = args.height, args.width, 2
    h1, w1 = H // 8, W // 8
    key = jax.random.PRNGKey(0)
    cfg = FlowFormerConfig(encoder_dtype=args.dtype, decoder_dtype=args.dtype,
                           inference_only=True)
    dt = jnp.bfloat16 if args.dtype == "bf16" else jnp.float32

    img = jax.random.uniform(key, (B, H, W, 3), dt)
    img4 = jnp.concatenate([img, img], axis=0)

    # --- Twins encoders ---
    twins = TwinsSVT()
    tw_params = twins.init(key, img[:1])["params"]
    f_twins2 = jax.jit(lambda p, x: twins.apply({"params": p}, x))
    timeit(f_twins2, tw_params, img, iters=args.iters, name=f"twins batch{B} (cnet)", vary=1)
    timeit(f_twins2, tw_params, img4, iters=args.iters, name=f"twins batch{2*B} (fnet)", vary=1)

    feat = jax.random.normal(key, (B, h1, w1, 256), dt)
    ctx = jax.random.normal(key, (B, h1, w1, 256), dt)

    # --- all-pairs correlation ---
    f_corr = jax.jit(all_pairs_correlation)
    timeit(f_corr, feat, feat, iters=args.iters, name="all-pairs correlation", vary=0)

    # --- memory encoder (corr + perceiver) ---
    menc = MemoryEncoder()
    me_params = menc.init(key, feat, feat, ctx)["params"]
    f_menc = jax.jit(lambda p, a, b, c: menc.apply({"params": p}, a, b, c))
    timeit(f_menc, me_params, feat, feat, ctx, iters=args.iters, name="memory encoder (corr+perceiver)", vary=1)

    # --- decoder ---
    cost_memory = jax.random.normal(key, (B * h1 * w1, 8, 128), dt)
    cost_maps = jax.random.normal(key, (B, h1 * w1, h1, w1), jnp.float32)
    ctx32 = ctx.astype(jnp.float32)
    dec = MemoryCovDecoder(decoder_depth=12, dtype=dt, inference_only=True)
    dec_params = dec.init(key, cost_memory, ctx32, cost_maps)["params"]
    f_dec = jax.jit(lambda p, m, c, cm: dec.apply({"params": p}, m, c, cm))
    timeit(f_dec, dec_params, cost_memory, ctx32, cost_maps,
           iters=args.iters, name="decoder scan x12", vary=1)

    # --- isolated decoder sub-ops (x12 to compare with the scan) ---
    coords = jax.random.uniform(key, (B, h1, w1, 2), jnp.float32) * 32

    @jax.jit
    def f_eft12(cm, crd):
        def body(c, _):
            v = encode_flow_token(cm, c)
            return c + v[..., :2] * 1e-6, ()
        c, _ = jax.lax.scan(body, crd, length=12)
        return c

    timeit(f_eft12, cost_maps, coords, iters=args.iters, name="encode_flow_token x12", vary=1)

    # --- full model ---
    model = FlowFormerCov(cfg)
    params = model.init(key, img[:1].astype(jnp.float32), img[:1].astype(jnp.float32))["params"]
    f_full = jax.jit(lambda p, a, b: model.apply({"params": p}, a, b)["flow_final"])
    imgf = img.astype(jnp.float32)
    timeit(f_full, params, imgf, imgf, iters=args.iters, name="FULL forward (pair batch2)", vary=1)


if __name__ == "__main__":
    main()
