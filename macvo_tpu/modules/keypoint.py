"""Keypoint selectors — fixed-K masked selection (reference: Module/KeypointSelector.py).

All selectors return ``(uv, valid)``: an ``(K,2)`` int32 array of (u,v) pixel
coordinates plus a ``(K,)`` bool validity mask, with ``K = num_point``. This
is the TPU-native contract replacing the reference's variable-N tensors: every
downstream stage (gathers, covariance, filters, solver) threads the mask
through fixed shapes instead of shrinking arrays, so the whole per-frame
pipeline stays inside one jit with zero host syncs (the reference flags its
``nonzero()`` sync as the selection bottleneck, KeypointSelector.py:325-327).

Random subsampling uses randomized-score top-K (see ops/select.py), which
draws the same uniform K-subset distribution the reference's
``nonzero + randperm`` does.
"""

from __future__ import annotations

import math
from functools import partial
from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.frame import StereoData
from ..ops.select import (
    border_mask,
    laplacian_magnitude,
    local_max_nms,
    local_min_nms,
    masked_median,
    masked_random_topk,
)
from ..utils.registry import RegisteredConfigTestable
from .frontend import DepthOutput, MatchOutput

_INT = lambda v: isinstance(v, int)
_POS_NUM = lambda v: isinstance(v, (int, float)) and v > 0
_ODD = lambda v: isinstance(v, int) and v > 0 and v % 2 == 1


def _squeeze_map(x: Optional[jnp.ndarray]) -> Optional[jnp.ndarray]:
    """(B,H,W,C) -> (H,W) or (H,W,C) for batch 0 (reference uses batch 0 only)."""
    if x is None:
        return None
    x = x[0]
    if x.shape[-1] == 1:
        x = x[..., 0]
    return x


class IKeypointSelector(RegisteredConfigTestable, register=False):
    """``select_point(frame, num_point, depth0, depth1, match) -> (uv, valid)``."""

    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config
        self._key = jax.random.PRNGKey(getattr(config, "seed", 0) if config else 0)
        self._calls = 0

    def _next_key(self) -> jax.Array:
        self._calls += 1
        return jax.random.fold_in(self._key, self._calls)

    def select_point(
        self,
        frame: StereoData,
        num_point: int,
        depth0_est: DepthOutput,
        depth1_est: DepthOutput,
        match_est: Optional[MatchOutput],
        key: Optional[jax.Array] = None,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """``key`` makes the call pure (traceable inside an outer jit); when
        omitted, an internal per-call key keeps standalone use stochastic."""
        raise NotImplementedError


class RandomSelector(IKeypointSelector):
    """Uniform random keypoints inside the border margin
    (reference: KeypointSelector.py:103-119)."""

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        h, w = frame.height, frame.width
        m = self.config.mask_width
        key = key if key is not None else self._next_key()
        ku, kv = jax.random.split(key)
        u = jax.random.randint(ku, (num_point,), m, w - m)
        v = jax.random.randint(kv, (num_point,), m, h - m)
        uv = jnp.stack([u, v], axis=-1).astype(jnp.int32)
        return uv, jnp.ones((num_point,), dtype=bool)

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"mask_width": lambda m: _INT(m) and m >= 0})


class GridSelector(IKeypointSelector):
    """Strictly uniform grid (reference: KeypointSelector.py:216-247). The grid
    is truncated/padded to exactly ``num_point`` rows for shape stability."""

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        h = frame.height - 2 * self.config.mask_width
        w = frame.width - 2 * self.config.mask_width
        unit = max(1, int(math.sqrt(num_point // 2)))
        vs = jnp.arange(0, h, max(1, h // unit))
        us = jnp.arange(0, w, max(1, w // (unit * 2)))
        uu, vv = jnp.meshgrid(us, vs, indexing="xy")
        uv = jnp.stack([uu.reshape(-1), vv.reshape(-1)], axis=-1) + self.config.mask_width
        n = uv.shape[0]
        if n >= num_point:
            return uv[:num_point].astype(jnp.int32), jnp.ones((num_point,), dtype=bool)
        pad = jnp.zeros((num_point - n, 2), dtype=jnp.int32)
        valid = jnp.concatenate([jnp.ones((n,), bool), jnp.zeros((num_point - n,), bool)])
        return jnp.concatenate([uv.astype(jnp.int32), pad], axis=0), valid

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"mask_width": lambda m: _INT(m) and m >= 0})


@partial(jax.jit, static_argnames=("mask_width", "k", "nms_size"))
def _gradient_mask_select(image, grad_std, mask_width: int, k: int, key, nms_size: int = 0):
    grad = laplacian_magnitude(image)
    mask = grad > (jnp.mean(grad) + grad_std * jnp.std(grad))
    mask = mask & border_mask(*grad.shape, mask_width)
    if nms_size > 0:
        mask = mask & local_max_nms(grad, nms_size)
    return masked_random_topk(mask, k, key)


class GradientSelector(IKeypointSelector):
    """Random points with Laplacian magnitude above mean + k*std
    (reference: KeypointSelector.py:121-158)."""

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        return _gradient_mask_select(
            frame.imageL[0], float(self.config.grad_std), int(self.config.mask_width),
            num_point, key if key is not None else self._next_key(),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "mask_width": lambda m: _INT(m) and m >= 0,
            "grad_std": _POS_NUM,
        })


class SparseGradientSelector(IKeypointSelector):
    """Gradient selector + NMS sparsification (reference: KeypointSelector.py:161-213).
    Also registered under the reference's (typo'd) name ``SparseGradienSelector``."""

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        return _gradient_mask_select(
            frame.imageL[0], float(self.config.grad_std), int(self.config.mask_width),
            num_point, key if key is not None else self._next_key(), nms_size=int(self.config.nms_size),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "mask_width": lambda m: _INT(m) and m >= 0,
            "grad_std": _POS_NUM,
            "nms_size": _ODD,
        })


class SparseGradienSelector(SparseGradientSelector):
    """Alias matching the reference registry name (KeypointSelector.py:161)."""


@partial(jax.jit, static_argnames=("kernel_size", "mask_width", "k", "has_flow_cov"))
def _cov_aware_select(
    d0, d0_cov, d1, d1_cov, flow_cov, model_mask,
    max_depth, max_depth_cov, max_match_cov,
    kernel_size: int, mask_width: int, k: int, key, has_flow_cov: bool,
):
    """CovAwareSelector core (reference: KeypointSelector.py:250-334, paper III.B)."""
    quality = d0_cov + d1_cov
    if has_flow_cov:
        flow_q = flow_cov[..., 0] + flow_cov[..., 1] - 2.0 * flow_cov[..., 2]
        quality = quality * flow_q
    nms = local_min_nms(quality, kernel_size)
    border = border_mask(*quality.shape, mask_width)
    depth_ok = (d0 < max_depth) & (d1 < max_depth)

    d0_thresh = jnp.minimum(max_depth_cov, masked_median(d0_cov, nms) * 1.5)
    mask = nms & border & depth_ok & (d0_cov < d0_thresh)
    if has_flow_cov:
        flow_thresh = jnp.minimum(max_match_cov, masked_median(flow_q, nms) * 1.5)
        mask = mask & (flow_q < flow_thresh)
    mask = mask & model_mask
    return masked_random_topk(mask, k, key)


class CovAwareSelector(IKeypointSelector):
    """MAC-VO's selector: quality = (sigma_d0+sigma_d1)*(sigma_uu+sigma_vv-2 sigma_uv),
    min-NMS, border/depth/adaptive-cov masks, random K-subset
    (reference: KeypointSelector.py:250-346)."""

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        assert depth0_est.cov is not None and depth1_est.cov is not None
        max_depth = self.config.max_depth
        if max_depth == "auto":
            max_depth = frame.fx * frame.frame_baseline

        d0, d0_cov = _squeeze_map(depth0_est.depth), _squeeze_map(depth0_est.cov)
        d1, d1_cov = _squeeze_map(depth1_est.depth), _squeeze_map(depth1_est.cov)
        flow_cov = _squeeze_map(match_est.cov) if match_est is not None else None
        has_flow_cov = flow_cov is not None
        if flow_cov is None:
            flow_cov = jnp.zeros(d0.shape + (3,), dtype=d0.dtype)

        model_mask = jnp.ones_like(d0, dtype=bool)
        if depth0_est.mask is not None:
            model_mask = model_mask & _squeeze_map(depth0_est.mask)
        if match_est is not None and match_est.mask is not None:
            model_mask = model_mask & _squeeze_map(match_est.mask)

        return _cov_aware_select(
            d0, d0_cov, d1, d1_cov, flow_cov, model_mask,
            float(max_depth), float(self.config.max_depth_cov), float(self.config.max_match_cov),
            int(self.config.kernel_size), int(self.config.mask_width), num_point,
            key if key is not None else self._next_key(), has_flow_cov,
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        cls._enforce_config_spec(config, {
            "mask_width": lambda m: _INT(m) and m >= 0,
            "max_depth": lambda d: (d == "auto") or _POS_NUM(d),
            "kernel_size": _ODD,
            "max_depth_cov": _POS_NUM,
            "max_match_cov": _POS_NUM,
        })


@partial(jax.jit, static_argnames=("kernel_size", "mask_width", "k"))
def _cov_aware_nodepth_select(flow_cov, model_mask, max_match_cov,
                              kernel_size: int, mask_width: int, k: int, key):
    flow_q = flow_cov[..., 0] + flow_cov[..., 1] - 2.0 * flow_cov[..., 2]
    nms = local_min_nms(flow_q, kernel_size)
    border = border_mask(*flow_q.shape, mask_width)
    flow_thresh = jnp.minimum(max_match_cov, masked_median(flow_q, nms) * 1.5)
    mask = nms & border & (flow_q < flow_thresh) & model_mask
    return masked_random_topk(mask, k, key)


class CovAwareSelector_NoDepth(IKeypointSelector):
    """Flow-cov-only variant used by Performant/Fast configs; grid fallback when
    no flow cov is available (reference: KeypointSelector.py:349-416)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self._fallback = GridSelector(SimpleNamespace(mask_width=config.mask_width))

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        if match_est is None or match_est.cov is None:
            return self._fallback.select_point(frame, num_point, depth0_est, depth1_est, match_est, key=key)
        flow_cov = _squeeze_map(match_est.cov)
        model_mask = jnp.ones(flow_cov.shape[:2], dtype=bool)
        if match_est.mask is not None:
            model_mask = model_mask & _squeeze_map(match_est.mask)
        return _cov_aware_nodepth_select(
            flow_cov, model_mask, float(self.config.max_match_cov),
            int(self.config.kernel_size), int(self.config.mask_width), num_point,
            key if key is not None else self._next_key(),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "mask_width": lambda m: _INT(m) and m >= 0,
            "kernel_size": _ODD,
            "max_match_cov": _POS_NUM,
        })


@partial(jax.jit, static_argnames=("mask_width", "k"))
def _mapping_select(depth, depth_cov, max_depth, max_depth_cov, mask_width: int, k: int, key):
    mask = (depth < max_depth) & (depth_cov < max_depth_cov)
    mask = mask & border_mask(*depth.shape, mask_width)
    return masked_random_topk(mask, k, key)


class MappingPointSelector(IKeypointSelector):
    """Dense-mapping point selection by depth / depth-cov thresholds
    (reference: KeypointSelector.py:78-100)."""

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        assert depth0_est.cov is not None
        return _mapping_select(
            _squeeze_map(depth0_est.depth), _squeeze_map(depth0_est.cov),
            float(self.config.max_depth), float(self.config.max_depth_cov),
            int(self.config.mask_width), num_point, key if key is not None else self._next_key(),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "max_depth": lambda v: isinstance(v, (int, float)),
            "max_depth_cov": lambda v: isinstance(v, (int, float)),
            "mask_width": _INT,
        })


class SelectorCompose(IKeypointSelector):
    """Distribute the keypoint budget over child selectors by weight
    (reference: KeypointSelector.py:51-75)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.selectors = [
            IKeypointSelector.instantiate(arg.type, arg.args) for arg in config.selector_args
        ]
        total = sum(config.weight)
        self.weights = [wgt / total for wgt in config.weight]

    def select_point(self, frame, num_point, depth0_est, depth1_est, match_est, key=None):
        uvs, valids = [], []
        for i, (sel, wgt) in enumerate(zip(self.selectors, self.weights)):
            sub = jax.random.fold_in(key, i) if key is not None else None
            uv, valid = sel.select_point(frame, int(num_point * wgt), depth0_est, depth1_est, match_est, key=sub)
            uvs.append(uv)
            valids.append(valid)
        return jnp.concatenate(uvs, axis=0), jnp.concatenate(valids, axis=0)

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        for arg in config.selector_args:
            IKeypointSelector.is_valid_config(arg)
        assert isinstance(config.weight, list)
        for val in config.weight:
            assert isinstance(val, (int, float))
