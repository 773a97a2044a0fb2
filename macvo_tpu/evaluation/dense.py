"""Dense-output evaluation: flow / depth accuracy and covariance calibration
(reference: Evaluation/{EvalFlow,EvalDepth}.py + Utility/Datatypes.py:27-94).

Per-frame metrics are computed in a jitted helper; the sequence loop streams
frames through the module under test and aggregates the reference's summary
dataclasses (FlowPerformance mean, DepthPerformance median, *CovPerformance
NLL quantiles).
"""

from __future__ import annotations

import dataclasses
from typing import Iterable

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class FlowPerformance:
    masked_epe: float
    epe: float
    px1: float
    px3: float
    px5: float

    @classmethod
    def mean(cls, values: list["FlowPerformance"]) -> "FlowPerformance":
        return cls(*[float(np.mean([getattr(v, f.name) for v in values]))
                     for f in dataclasses.fields(cls)])


@dataclasses.dataclass
class FlowCovPerformance:
    masked_nll: float
    q25_nll: float
    q50_nll: float
    q75_nll: float

    @classmethod
    def mean(cls, values: list["FlowCovPerformance"]) -> "FlowCovPerformance":
        return cls(*[float(np.mean([getattr(v, f.name) for v in values]))
                     for f in dataclasses.fields(cls)])


@dataclasses.dataclass
class DepthPerformance:
    masked_err: float
    err_25: float
    err_50: float
    err_75: float

    @classmethod
    def median(cls, values: list["DepthPerformance"]) -> "DepthPerformance":
        return cls(*[float(np.median([getattr(v, f.name) for v in values]))
                     for f in dataclasses.fields(cls)])


@dataclasses.dataclass
class DepthCovPerformance:
    masked_nll: float
    q25_nll: float
    q50_nll: float
    q75_nll: float

    @classmethod
    def mean(cls, values: list["DepthCovPerformance"]) -> "DepthCovPerformance":
        return cls(*[float(np.mean([getattr(v, f.name) for v in values]))
                     for f in dataclasses.fields(cls)])


@jax.jit
def _flow_metrics(est_flow, gt_flow, mask):
    epe = jnp.linalg.norm(est_flow - gt_flow, axis=-1)
    finite = jnp.isfinite(epe)
    epe_all = jnp.where(finite, epe, jnp.nan)
    masked = jnp.where(mask & finite, epe, jnp.nan)
    return {
        "masked_epe": jnp.nanmean(masked),
        "epe": jnp.nanmean(epe_all),
        "px1": jnp.nanmean(jnp.where(mask & finite, (epe < 1).astype(jnp.float32), jnp.nan)),
        "px3": jnp.nanmean(jnp.where(mask & finite, (epe < 3).astype(jnp.float32), jnp.nan)),
        "px5": jnp.nanmean(jnp.where(mask & finite, (epe < 5).astype(jnp.float32), jnp.nan)),
    }


@jax.jit
def _gaussian_nll(err_sq, var, mask):
    var = jnp.maximum(var, 1e-9)
    nll = err_sq / var + jnp.log(var)
    ok = mask & jnp.isfinite(nll)
    masked = jnp.where(ok, nll, jnp.nan)
    return {
        "masked_nll": jnp.nanmean(masked),
        "q25_nll": jnp.nanquantile(masked, 0.25),
        "q50_nll": jnp.nanquantile(masked, 0.50),
        "q75_nll": jnp.nanquantile(masked, 0.75),
    }


def _pairs(seq) -> Iterable:
    prev = None
    for frame in seq:
        if prev is not None:
            yield prev, frame
        prev = frame


def evaluate_flow(matcher, seq, max_flow: float = 400.0, use_gt_mask: bool = False) -> FlowPerformance:
    """(reference: Evaluation/EvalFlow.py:14-56)"""
    results = []
    for f0, f1 in _pairs(seq):
        assert f0.stereo.gt_flow is not None
        out = matcher.estimate(f0.stereo, f1.stereo)
        gt = jnp.asarray(f0.stereo.gt_flow)
        mask = jnp.linalg.norm(gt, axis=-1) < max_flow
        if use_gt_mask and f0.stereo.flow_mask is not None:
            mask = mask & jnp.asarray(f0.stereo.flow_mask)[..., 0]
        m = jax.device_get(_flow_metrics(out.flow, gt, mask))
        results.append(FlowPerformance(**{k: float(v) for k, v in m.items()}))
    return FlowPerformance.mean(results)


def evaluate_flowcov(matcher, seq, max_flow: float = 400.0, use_gt_mask: bool = False) -> FlowCovPerformance:
    """(reference: Evaluation/EvalFlow.py:60-131)"""
    results = []
    for f0, f1 in _pairs(seq):
        out = matcher.estimate(f0.stereo, f1.stereo)
        assert out.cov is not None, "matcher does not provide covariance"
        gt = jnp.asarray(f0.stereo.gt_flow)
        err_sq = jnp.square(out.flow - gt)
        var = out.cov[..., :2]
        mask = (jnp.linalg.norm(gt, axis=-1) < max_flow)[..., None]
        if use_gt_mask and f0.stereo.flow_mask is not None:
            mask = mask & jnp.asarray(f0.stereo.flow_mask)
        m = jax.device_get(_gaussian_nll(err_sq, var, mask))
        results.append(FlowCovPerformance(**{k: float(v) for k, v in m.items()}))
    return FlowCovPerformance.mean(results)


def evaluate_depth(depth_module, seq, max_depth: float = 80.0) -> DepthPerformance:
    """(reference: Evaluation/EvalDepth.py:13-48)"""
    results = []
    for frame in seq:
        assert frame.stereo.gt_depth is not None
        out = depth_module.estimate(frame.stereo)
        gt = np.asarray(frame.stereo.gt_depth)
        est = np.asarray(out.depth)
        err = np.abs(est - gt)
        ok = np.isfinite(err) & (gt < max_depth)
        vals = err[ok]
        if vals.size == 0:
            continue
        results.append(DepthPerformance(
            masked_err=float(np.mean(vals)),
            err_25=float(np.quantile(vals, 0.25)),
            err_50=float(np.quantile(vals, 0.50)),
            err_75=float(np.quantile(vals, 0.75)),
        ))
    return DepthPerformance.median(results)


def evaluate_depthcov(depth_module, seq, max_depth: float = 80.0) -> DepthCovPerformance:
    """(reference: Evaluation/EvalDepth.py:51-96)"""
    results = []
    for frame in seq:
        out = depth_module.estimate(frame.stereo)
        assert out.cov is not None, "depth module does not provide covariance"
        gt = jnp.asarray(frame.stereo.gt_depth)
        err_sq = jnp.square(out.depth - gt)
        mask = gt < max_depth
        m = jax.device_get(_gaussian_nll(err_sq, out.cov, mask))
        results.append(DepthCovPerformance(**{k: float(v) for k, v in m.items()}))
    return DepthCovPerformance.mean(results)
