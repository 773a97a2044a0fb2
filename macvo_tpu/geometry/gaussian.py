"""Anisotropic Gaussian patch kernels + mixture statistics (covariance engine math).

TPU-native re-derivation of the reference's kernel math (Utility/Math.py:43-93).
Everything is fixed-shape and vmap/jit friendly: the 2x2 inverse is closed-form
(no pinverse), the kernel grid is a static ``K x K`` meshgrid, and mixture
statistics operate on fixed-size flattened patches with probability-floor
masking done via ``jnp.where``.
"""

from __future__ import annotations

import jax.numpy as jnp


def inv_2x2(cov: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Closed-form inverse of (...,2,2) SPD matrices with determinant guard."""
    a, b = cov[..., 0, 0], cov[..., 0, 1]
    c, d = cov[..., 1, 0], cov[..., 1, 1]
    det = a * d - b * c
    det = jnp.where(jnp.abs(det) < eps, eps, det)
    inv = jnp.stack(
        [jnp.stack([d, -b], -1), jnp.stack([-c, a], -1)],
        axis=-2,
    )
    return inv / det[..., None, None]


def gaussian_full_kernels(cov_2x2: jnp.ndarray, kernel_size: int) -> jnp.ndarray:
    """Per-keypoint anisotropic Gaussian kernels over a square patch.

    In:  cov_2x2 (N,2,2) full 2D flow covariances; kernel_size odd.
    Out: (N,K,K) kernels, each normalized to sum 1 — the weighting used for
    depth aggregation in MatchCovariance (reference: Utility/Math.py:43-63,
    consumed at Module/Covariance/Project2to3.py:143-171).
    """
    half = (kernel_size - 1) / 2.0
    coords = jnp.linspace(-half, half, kernel_size, dtype=cov_2x2.dtype)
    # (K,K,2) grid of (x,y) offsets, ij-indexed to match row/col patch layout.
    grid = jnp.stack(jnp.meshgrid(coords, coords, indexing="ij"), axis=-1)
    inv_cov = inv_2x2(cov_2x2)
    # z_{n,x,y} = exp(-0.5 * g^T inv_cov g)
    quad = jnp.einsum("xyi,nij,xyj->nxy", grid, inv_cov, grid)
    z = jnp.exp(-0.5 * quad)
    total = jnp.sum(z, axis=(-1, -2), keepdims=True)
    return z / jnp.maximum(total, 1e-12)


def gaussian_mixture_mean_var(
    means: jnp.ndarray,
    variances: jnp.ndarray,
    probs: jnp.ndarray,
    prob_threshold: float = 1e-3,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mean/variance of B Gaussian mixtures of N components each, (B,N) inputs.

    Low-probability components are zeroed for robustness and probabilities are
    renormalized; the returned variance carries the reference's /2 damping
    heuristic (Utility/Math.py:86-93) so covariance magnitudes match.
    """
    probs = jnp.where(probs < prob_threshold, 0.0, probs)
    probs = probs / jnp.maximum(jnp.sum(probs, axis=1, keepdims=True), 1e-12)
    mean = jnp.sum(means * probs, axis=1)
    var = jnp.sum((variances + jnp.square(means)) * probs, axis=1) - jnp.square(mean)
    return mean, var / 2.0


def mahalanobis(x: jnp.ndarray, mu: jnp.ndarray, sigma: jnp.ndarray) -> jnp.ndarray:
    """sqrt((x-mu)^T Sigma^-1 (x-mu)) for (N,F) points and (N,F,F) covariances."""
    diff = x - mu
    sol = jnp.linalg.solve(sigma, diff[..., None])[..., 0]
    return jnp.sqrt(jnp.maximum(jnp.einsum("...i,...i->...", diff, sol), 0.0))


def mahalanobis_inv(x: jnp.ndarray, mu: jnp.ndarray, sigma_inv: jnp.ndarray) -> jnp.ndarray:
    diff = x - mu
    return jnp.sqrt(
        jnp.maximum(jnp.einsum("...i,...ij,...j->...", diff, sigma_inv, diff), 0.0)
    )
