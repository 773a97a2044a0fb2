"""Cross-frame encoder feature cache parity.

``FlowFormerCovFrontend`` caches frame t's fnet/cnet outputs on device and
reuses them at t+1 (reference re-encodes every image every frame,
Module/Frontend/Frontend.py:218-232). The cache must be a pure optimization:
the cached steady-state path and the cold path compute the same math.
"""

from types import SimpleNamespace

import jax.numpy as jnp
import numpy as np
import pytest

from macvo_tpu.data.frame import StereoData
from macvo_tpu.modules.frontend_network import FlowFormerCovFrontend


def _frame(key: int, h: int = 64, w: int = 96) -> StereoData:
    rng = np.random.default_rng(key)
    return StereoData(
        T_BS=jnp.asarray([[1.0, 0, 0, 0, 0, 0, 0]]),
        K=jnp.asarray([[[64.0, 0, w / 2], [0, 64.0, h / 2], [0, 0, 1.0]]]),
        baseline=jnp.asarray([0.25]),
        time_ns=jnp.asarray([key], jnp.int64),
        imageL=jnp.asarray(rng.random((1, h, w, 3), np.float32)),
        imageR=jnp.asarray(rng.random((1, h, w, 3), np.float32)),
    )


@pytest.fixture(scope="module")
def frontend() -> FlowFormerCovFrontend:
    return FlowFormerCovFrontend(SimpleNamespace(
        weight="random:0", enc_dtype="fp32", dec_dtype="fp32",
        decoder_depth=2, enforce_positive_disparity=False))


def test_cached_pair_matches_cold(frontend: FlowFormerCovFrontend) -> None:
    f1, f2 = _frame(1), _frame(2)

    frontend._feat_cache = None
    cold_depth, cold_match = frontend.estimate_pair(f1, f2)

    # Seed the cache the way the odometry loop does (depth pass on f1 at
    # initialize time, or the previous estimate_pair) and rerun.
    frontend._feat_cache = None
    frontend.estimate_depth(f1)
    assert frontend._feat_cache is not None and frontend._feat_cache[0] is f1
    hot_depth, hot_match = frontend.estimate_pair(f1, f2)
    assert frontend._feat_cache[0] is f2  # cache rolled forward

    # depth = bl*fx/disp amplifies float-level disparity jitter (different
    # batch compositions fuse differently in XLA) — tolerance is relative.
    np.testing.assert_allclose(
        np.asarray(cold_depth.depth), np.asarray(hot_depth.depth),
        rtol=5e-3, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(cold_match.flow), np.asarray(hot_match.flow),
        rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(cold_match.cov), np.asarray(hot_match.cov),
        rtol=2e-3, atol=2e-4)


def test_cache_miss_falls_back_to_cold(frontend: FlowFormerCovFrontend) -> None:
    f1, f2, f3 = _frame(3), _frame(4), _frame(5)
    frontend._feat_cache = None
    frontend.estimate_pair(f1, f2)
    # f3 is not the cached frame (f2): the frontend must take the cold path
    # (keyframe skipping makes this legal in the real loop), not reuse f2.
    depth_a, match_a = frontend.estimate_pair(f3, f2)
    frontend._feat_cache = None
    depth_b, match_b = frontend.estimate_pair(f3, f2)
    np.testing.assert_allclose(
        np.asarray(match_a.flow), np.asarray(match_b.flow), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(depth_a.depth), np.asarray(depth_b.depth), rtol=1e-5, atol=1e-5)


def test_fused_latent_attention_interpret_matches_xla():
    """Pallas interpret-mode parity of the fused perceiver input stage
    (CPU-safe twin of the on-chip test in test_tpu.py)."""
    import jax
    import jax.numpy as jnp

    from macvo_tpu.ops.latent_attn import (
        latent_cross_attention,
        latent_cross_attention_xla,
    )

    n, t, d_in, d, nq = 40, 16, 64, 128, 8
    keys = jax.random.split(jax.random.PRNGKey(7), 8)
    tokens = jax.random.normal(keys[0], (n, t, d_in), jnp.float32)
    wk = jax.random.normal(keys[1], (d_in, d)) * 0.1
    bk = jax.random.normal(keys[2], (d,)) * 0.1
    wv = jax.random.normal(keys[3], (d_in, d)) * 0.1
    bv = jax.random.normal(keys[4], (d,)) * 0.1
    q = jax.random.normal(keys[5], (nq, d))
    wp = jax.random.normal(keys[6], (d, d)) * 0.1
    bias = jax.random.normal(keys[7], (nq, d))

    out = np.asarray(latent_cross_attention(
        tokens, wk, bk, wv, bv, q, wp, bias, block_pixels=16, interpret=True))
    ref = np.asarray(latent_cross_attention_xla(tokens, wk, bk, wv, bv, q, wp, bias))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)

    # Chunked path (chunk_pixels < n forces the lax.map over >1 pallas call —
    # the 640x640 scoped-vmem-OOM guard) must produce identical results,
    # including the non-divisible tail (n=40 -> chunks of 32 -> pad 24).
    chunked = np.asarray(latent_cross_attention(
        tokens, wk, bk, wv, bv, q, wp, bias,
        block_pixels=16, chunk_pixels=32, interpret=True))
    np.testing.assert_allclose(chunked, ref, rtol=2e-4, atol=2e-4)


def test_fused_latent_attention_large_token_count_shrinks_block():
    """640x640 inputs give T=100 patch tokens per pixel; the kernel must
    halve its pixel block (bp*T cap) rather than blow scoped VMEM. Exercises
    the halving + chunking paths together in interpret mode."""
    import jax
    import jax.numpy as jnp

    from macvo_tpu.ops.latent_attn import (
        latent_cross_attention,
        latent_cross_attention_xla,
    )

    n, t, d_in, d, nq = 256, 100, 64, 128, 8
    keys = jax.random.split(jax.random.PRNGKey(3), 8)
    tokens = jax.random.normal(keys[0], (n, t, d_in), jnp.float32)
    wk = jax.random.normal(keys[1], (d_in, d)) * 0.1
    bk = jax.random.normal(keys[2], (d,)) * 0.1
    wv = jax.random.normal(keys[3], (d_in, d)) * 0.1
    bv = jax.random.normal(keys[4], (d,)) * 0.1
    q = jax.random.normal(keys[5], (nq, d))
    wp = jax.random.normal(keys[6], (d, d)) * 0.1
    bias = jax.random.normal(keys[7], (nq, d))

    out = np.asarray(latent_cross_attention(
        tokens, wk, bk, wv, bv, q, wp, bias,
        block_pixels=128, chunk_pixels=128, interpret=True))
    ref = np.asarray(latent_cross_attention_xla(tokens, wk, bk, wv, bv, q, wp, bias))
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-4)
