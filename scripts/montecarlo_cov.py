#!/usr/bin/env python
"""Monte-Carlo validation of the 2D->3D covariance projection
(reference methodology: Scripts/Statistic/Montecarlo_{DepthVariance,
DisparityVariance}.py).

Samples pixel+depth observations from known 2D/depth distributions, pushes
them through the closed-form projection (ops/cov_project.py), and compares
against the empirical covariance of the backprojected samples. Prints the
relative Frobenius error per test case; fails (exit 1) above --tol.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def empirical_covariance(u, v, d, fx, fy, cx, cy):
    x = d
    y = (u - cx) * d / fx
    z = (v - cy) * d / fy
    pts = np.stack([x, y, z], axis=1)
    return np.cov(pts.T)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--samples", type=int, default=2_000_000)
    parser.add_argument("--tol", type=float, default=0.05)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax.numpy as jnp

    from macvo_tpu.ops.cov_project import covariance_2to3_full

    rng = np.random.default_rng(args.seed)
    fx = fy = 320.0
    cx, cy = 320.0, 240.0

    cases = [
        # (u, v, depth, sigma_uu, sigma_vv, sigma_uv, sigma_dd)
        (320.0, 240.0, 5.0, 1.0, 1.0, 0.0, 0.01),      # principal point
        (480.0, 120.0, 10.0, 2.0, 0.5, 0.3, 0.05),     # off-center, correlated
        (100.0, 400.0, 2.0, 0.5, 0.5, -0.2, 0.002),    # near, anti-correlated
    ]
    worst = 0.0
    for u0, v0, d0, suu, svv, suv, sdd in cases:
        cov2d = np.array([[suu, suv], [suv, svv]])
        uv = rng.multivariate_normal([u0, v0], cov2d, size=args.samples)
        d = rng.normal(d0, np.sqrt(sdd), size=args.samples)
        emp = empirical_covariance(uv[:, 0], uv[:, 1], d, fx, fy, cx, cy)

        pred = np.asarray(covariance_2to3_full(
            jnp.asarray([suu]), jnp.asarray([suv]), jnp.asarray([svv]),
            jnp.asarray([sdd]), jnp.asarray([u0]), jnp.asarray([v0]),
            jnp.asarray([d0]), fx, fy, cx, cy,
        ))[0]
        rel = np.linalg.norm(pred - emp) / np.linalg.norm(emp)
        worst = max(worst, rel)
        print(f"u={u0:6.1f} v={v0:6.1f} d={d0:5.1f}: relative error {rel:.4f}")

    print(f"worst-case relative error: {worst:.4f} (tol {args.tol})")
    sys.exit(0 if worst < args.tol else 1)


if __name__ == "__main__":
    main()
