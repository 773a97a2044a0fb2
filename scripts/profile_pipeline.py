"""Device timing of the NON-frontend per-frame stages at 480x640: the fused
keypoint pipeline (selection -> gathers -> covariance -> filters -> packing),
the dense-mapping pipeline, and the two-frame LM solve. Same scan-slope
method as profile_frontend.py.

    PYTHONPATH=.:$PYTHONPATH python scripts/profile_pipeline.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/macvo_jax_cache")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def scan_time(stage_fn, carry0, k_lo=1, k_hi=5, reps=3, name=""):
    def make(k):
        @jax.jit
        def run(c):
            def body(c0, _):
                c1 = stage_fn(c0)
                c1 = jax.tree.map(
                    lambda a, b: (a + jnp.asarray(1e-6, b.dtype)).astype(b.dtype)
                    if jnp.issubdtype(b.dtype, jnp.floating) else b,
                    c1, c0)
                return c1, ()
            c, _ = jax.lax.scan(body, c, length=k)
            return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(c))
        return run

    f_lo, f_hi = make(k_lo), make(k_hi)
    np.asarray(f_lo(carry0)); np.asarray(f_hi(carry0))

    def meas(f):
        best = float("inf")
        for r in range(reps):
            c = jax.tree.map(
                lambda x: x + jnp.asarray((r + 1) * 1e-5, x.dtype)
                if jnp.issubdtype(x.dtype, jnp.floating) else x, carry0)
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
    import argparse

    import bench
    from macvo_tpu.modules.frontend import DepthOutput, MatchOutput

    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    args = ap.parse_args()
    H, W = args.height, args.width
    odom, _ = bench.build_odometry(W, H)

    from macvo_tpu.data.datasets.synthetic import SyntheticStereo
    seq = SyntheticStereo({"n_frames": 2, "width": W, "height": H,
                           "fx": 320.0, "fy": 320.0, "cx": W / 2.0, "cy": H / 2.0})
    f0, f1 = seq[0], seq[1]

    key = jax.random.PRNGKey(0)
    depth_map = jax.random.uniform(key, (1, H, W, 1), jnp.float32, 2.0, 30.0)
    cov_map = jax.random.uniform(jax.random.fold_in(key, 1), (1, H, W, 1), jnp.float32, 0.01, 1.0)
    disp = 320.0 * 0.25 / depth_map
    depth = DepthOutput(depth=depth_map, cov=cov_map, disparity=disp,
                        disparity_uncertainty=cov_map, mask=None)
    flow = jax.random.normal(jax.random.fold_in(key, 2), (1, H, W, 2)) * 3.0
    fcov = jax.random.uniform(jax.random.fold_in(key, 3), (1, H, W, 3), jnp.float32, 0.1, 1.0)
    match = MatchOutput(flow=flow, cov=fcov, mask=None)
    img = jnp.asarray(f0.stereo.imageL, jnp.float32)
    pose = jnp.asarray([0, 0, 0, 0, 0, 0, 1], jnp.float32)

    core = odom._pipeline_core(f0.stereo, f1.stereo)

    def kp_stage(c):
        im, p = c
        packed = core(im, depth, depth, match, p, p, key)
        return (im, p + jnp.mean(packed) * 1e-9 + packed[0, :7] * 0.0)

    scan_time(kp_stage, (img, pose), name="keypoint pipeline (fused)")

    mcore = odom._mapping_core(f0.stereo)

    def map_stage(c):
        im, p = c
        packed = mcore(im, depth, depth, match, p, key)
        return (im, p + jnp.mean(packed) * 1e-9 + packed[0, 1:8] * 0.0)

    scan_time(map_stage, (img, pose), name="mapping pipeline (fused)")

    # Two-frame LM solve at bench capacity (256 obs, disp graph).
    from macvo_tpu.backend.solver import TwoFrameData, solve_two_frame
    from macvo_tpu.geometry import camera, se3

    n = 256
    kk = jax.random.PRNGKey(7)
    pose6 = se3.exp(0.05 * jax.random.normal(kk, (6,)))
    pts_c = jnp.stack([
        jax.random.uniform(jax.random.fold_in(kk, 1), (n,), minval=4.0, maxval=20.0),
        jax.random.uniform(jax.random.fold_in(kk, 2), (n,), minval=-3.0, maxval=3.0),
        jax.random.uniform(jax.random.fold_in(kk, 3), (n,), minval=-2.0, maxval=2.0),
    ], axis=1)
    K = jnp.array([[320.0, 0, 320], [0, 320.0, 240], [0, 0, 1]])
    eye3 = jnp.broadcast_to(jnp.eye(3) * 0.01, (n, 3, 3))
    data = TwoFrameData(
        pose0=pose6, points_w=se3.act(pose6, pts_c), points_c=pts_c,
        kp2=camera.point_to_pixel_ned(pts_c, K), disp2=K[0, 0] * 0.25 / pts_c[:, 0],
        cov_obs_c=eye3, cov_pts_w=eye3,
        cov_kp2=jnp.broadcast_to(jnp.eye(2) * 0.25, (n, 2, 2)),
        disp2_cov=jnp.full((n,), 0.25), K=K, baseline=jnp.asarray(0.25),
        mask=jnp.ones((n,), bool),
    )

    def solve_stage(d):
        p = solve_two_frame(d, graph_type="disp")
        return jax.tree.map(
            lambda x: x + jnp.mean(p).astype(x.dtype) * 1e-9
            if jnp.issubdtype(x.dtype, jnp.floating) else x, d)

    scan_time(solve_stage, data, name="two-frame LM solve (disp, 256 obs)")


if __name__ == "__main__":
    main()
