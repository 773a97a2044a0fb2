"""Training losses for the FlowFormerCov cov-head
(reference: Train/MatchingNet/loss.py).

All losses consume the decoder's per-iteration stacks ``(depth, B, H, W, 2)``
channel-last and are pure jnp (grad/jit/pjit safe).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def _iteration_weights(n: int, gamma: float, dtype=jnp.float32) -> jnp.ndarray:
    """gamma^(n-i-1) sequence weighting (loss.py:10-12)."""
    i = jnp.arange(n, dtype=dtype)
    return gamma ** (n - i - 1.0)


def flow_loss(
    gamma: float, preds: jnp.ndarray, gt: jnp.ndarray, mask: jnp.ndarray
) -> jnp.ndarray:
    """Gamma-weighted masked L1 over decoder iterations (loss.py:4-14)."""
    w = _iteration_weights(preds.shape[0], gamma, preds.dtype)
    err = jnp.abs(preds - gt[None])                     # (D,B,H,W,2)
    masked = jnp.where(mask[None], err, jnp.nan)
    per_iter = jnp.nanmean(masked, axis=(1, 2, 3, 4))
    return jnp.sum(w * per_iter)


def cov_loss(
    gamma: float,
    preds: jnp.ndarray,
    gt: jnp.ndarray,
    cov_preds: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
    eps: float = 1e-7,
    tail_weight: float = 0.0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Gamma-weighted Gaussian NLL: err^2/sigma^2 + log sigma^2, with the
    squared error DETACHED so only the cov head learns (loss.py:17-34).

    ``tail_weight`` > 0 up-weights the pixels above the batch's 90th EPE
    percentile by (1 + tail_weight), renormalized to mean weight 1 — the
    sigma-TAIL calibration lever (chi2 p90 coverage chronically under
    nominal because the plain NLL optimum tracks the bulk; see
    evidence/cov_calibration_real_v4_raw.json)."""
    w = _iteration_weights(preds.shape[0], gamma, preds.dtype)
    exp_cov = cov_preds + eps
    error = jax.lax.stop_gradient(jnp.square(preds - gt[None]))
    nll = error / exp_cov + jnp.log(exp_cov)
    if mask is not None:
        nll = jnp.where(mask[None], nll, 0.0)
    if tail_weight > 0.0:
        epe2 = jnp.sum(error[-1], axis=-1, keepdims=True)     # (B,H,W,1)
        masked_epe2 = (jnp.where(mask, epe2, jnp.nan)
                       if mask is not None else epe2)
        thr = jnp.nanquantile(masked_epe2, 0.9)
        w_pix = jnp.where(epe2 > thr, 1.0 + tail_weight, 1.0)
        if mask is not None:
            denom = jnp.maximum(jnp.mean(jnp.where(mask, w_pix, 0.0))
                                / jnp.maximum(jnp.mean(mask.astype(w_pix.dtype)), eps), eps)
        else:
            denom = jnp.maximum(jnp.mean(w_pix), eps)
        nll = nll * (w_pix / denom)[None]
    loss = jnp.mean(jnp.sum(w[:, None, None, None, None] * nll, axis=0))
    return loss, error[-1]


def final_cov_loss(preds, gt, cov_preds, mask=None, eps: float = 1e-7):
    """NLL on the final iteration only (loss.py:36-41)."""
    return cov_loss(1.0, preds[-1:], gt, cov_preds[-1:], mask, eps)


def sequence_loss(
    preds: jnp.ndarray,
    cov_preds: Optional[jnp.ndarray],
    gt: jnp.ndarray,
    flow_mask: Optional[jnp.ndarray],
    gamma: float = 0.85,
    max_flow: float = 400.0,
    training_mode: str = "flow",
    tail_weight: float = 0.0,
) -> tuple[jnp.ndarray, dict]:
    """Loss dispatch by training mode (loss.py:59-93): 'flow' trains the flow
    branch; 'cov'/'finalcov' train the covariance head with NLL."""
    gt_mag = jnp.linalg.norm(gt, axis=-1, keepdims=True)
    mask = gt_mag < max_flow
    if flow_mask is not None:
        mask = mask & flow_mask.astype(bool)

    metrics: dict = {}
    if training_mode == "flow":
        loss = flow_loss(gamma, preds, gt, mask)
    elif training_mode == "cov":
        assert cov_preds is not None
        loss, error = cov_loss(gamma, preds, gt, cov_preds, mask,
                               tail_weight=tail_weight)
        metrics["error"] = jnp.mean(error)
        metrics["cov"] = jnp.mean(cov_preds[-1])
    elif training_mode == "finalcov":
        assert cov_preds is not None
        loss, error = final_cov_loss(preds, gt, cov_preds, mask)
        metrics["error"] = jnp.mean(error)
        metrics["cov"] = jnp.mean(cov_preds[-1])
    else:
        raise ValueError(f"Unavailable training mode {training_mode}")
    return loss, metrics


def sequence_metrics(preds: jnp.ndarray, gt: jnp.ndarray, flow_mask=None, max_flow=400.0) -> dict:
    """EPE / n-px accuracy metrics (loss.py:96-110)."""
    epe = jnp.sqrt(jnp.sum(jnp.square(preds[-1] - gt), axis=-1))
    gt_mag = jnp.linalg.norm(gt, axis=-1)
    mask = gt_mag < max_flow
    if flow_mask is not None:
        mask = mask & flow_mask[..., 0].astype(bool)
    masked = jnp.where(mask, epe, jnp.nan)
    return {
        "epe": jnp.nanmean(masked),
        "1px": jnp.nanmean(jnp.where(mask, (epe < 1).astype(jnp.float32), jnp.nan)),
        "3px": jnp.nanmean(jnp.where(mask, (epe < 3).astype(jnp.float32), jnp.nan)),
        "5px": jnp.nanmean(jnp.where(mask, (epe < 5).astype(jnp.float32), jnp.nan)),
    }
