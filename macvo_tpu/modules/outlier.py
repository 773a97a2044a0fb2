"""Observation outlier filters — mask producers (reference: Module/OutlierFilter.py).

Filters consume a dict of ``(N, ...)`` observation arrays (the fields of a
MatchObs row batch, see worldmap/visual_map.py MATCH_FIELDS) and return an
``(N,)`` bool mask: True = keep. TPU-first: filters never shrink arrays —
masks AND together through the fixed-K pipeline, and the map push compacts
once at the end.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Mapping

import jax.numpy as jnp

from ..data.frame import StereoData
from ..utils.logging import Logger
from ..utils.registry import RegisteredConfigTestable

Obs = Mapping[str, jnp.ndarray]


class IObservationFilter(RegisteredConfigTestable, register=False):
    """``filter(values) -> (N,) bool`` keep-mask."""

    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config

    @property
    def required_keys(self) -> set[str]:
        return set()

    def verify_shape(self, values: Obs) -> bool:
        return all(k in values for k in self.required_keys)

    def set_meta(self, meta: StereoData) -> None:
        """Receive first-frame meta (intrinsics etc.) for dynamic thresholds
        (reference: OutlierFilter.py:27-32)."""

    def filter(self, values: Obs) -> jnp.ndarray:
        raise NotImplementedError

    @staticmethod
    def _num_obs(values: Obs) -> int:
        return next(iter(values.values())).shape[0]


class IdentityFilter(IObservationFilter):
    """Keep everything (reference: OutlierFilter.py:80-88)."""

    def filter(self, values: Obs) -> jnp.ndarray:
        return jnp.ones((self._num_obs(values),), dtype=bool)

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class FilterCompose(IObservationFilter):
    """AND-chain of child filters (reference: OutlierFilter.py:44-79)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.filters = [
            IObservationFilter.instantiate(arg.type, arg.args) for arg in config.filter_args
        ]
        self.verbose = getattr(config, "verbose", False)

    @property
    def required_keys(self) -> set[str]:
        return {k for f in self.filters for k in f.required_keys}

    def set_meta(self, meta: StereoData) -> None:
        for f in self.filters:
            f.set_meta(meta)

    def filter(self, values: Obs) -> jnp.ndarray:
        mask = jnp.ones((self._num_obs(values),), dtype=bool)
        for f in self.filters:
            mask = mask & f.filter(values)
            if self.verbose:
                Logger.info(f"\t{type(f).__name__} | => {int(mask.sum())}")
        return mask

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        assert isinstance(config.filter_args, list)
        for arg in config.filter_args:
            IObservationFilter.is_valid_config(arg)


class CovarianceSanityFilter(IObservationFilter):
    """Reject observations whose 3x3 covariances carry NaN/Inf
    (reference: OutlierFilter.py:91-104)."""

    @property
    def required_keys(self) -> set[str]:
        return {"obs1_covTc", "obs2_covTc"}

    def filter(self, values: Obs) -> jnp.ndarray:
        bad = jnp.zeros((self._num_obs(values),), dtype=bool)
        for key in ("obs1_covTc", "obs2_covTc"):
            cov = values[key]
            bad = bad | jnp.any(jnp.isnan(cov) | jnp.isinf(cov), axis=(-1, -2))
        return ~bad

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class SimpleDepthFilter(IObservationFilter):
    """Keep observations with depth in [min_depth, max_depth]; max 'auto' means
    fx * baseline (reference: OutlierFilter.py:106-127)."""

    @property
    def required_keys(self) -> set[str]:
        return {"pixel1_d", "pixel2_d"}

    def set_meta(self, meta: StereoData) -> None:
        if self.config.max_depth == "auto":
            self.config.max_depth = meta.fx * meta.frame_baseline

    def filter(self, values: Obs) -> jnp.ndarray:
        d1 = values["pixel1_d"][..., 0]
        d2 = values["pixel2_d"][..., 0]
        lo, hi = self.config.min_depth, self.config.max_depth
        return ~((d1 < lo) | (d1 > hi) | (d2 < lo) | (d2 > hi))

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        if isinstance(config.max_depth, (int, float)):
            assert config.max_depth > config.min_depth
        cls._enforce_config_spec(config, {
            "min_depth": lambda d: isinstance(d, (int, float)) and d > 0.0,
            "max_depth": lambda d: (d == "auto") or (isinstance(d, (int, float)) and d > 0.0),
        })


class LikelyFrontOfCamFilter(IObservationFilter):
    """Keep observations likely in front of the camera: d - 2*sigma_d > 0 on
    both frames; no-op when depth cov is the -1 placeholder
    (reference: OutlierFilter.py:130-144)."""

    @property
    def required_keys(self) -> set[str]:
        return {"pixel1_d", "pixel1_d_cov", "pixel2_d", "pixel2_d_cov"}

    def filter(self, values: Obs) -> jnp.ndarray:
        c1 = values["pixel1_d_cov"][..., 0]
        c2 = values["pixel2_d_cov"][..., 0]
        d1 = values["pixel1_d"][..., 0]
        d2 = values["pixel2_d"][..., 0]
        keep = ((d1 - 2.0 * jnp.sqrt(jnp.maximum(c1, 0.0))) > 0.0) & (
            (d2 - 2.0 * jnp.sqrt(jnp.maximum(c2, 0.0))) > 0.0
        )
        # Placeholder covariance (-1) disables the filter, matching the
        # reference's any()-based bailout but without a host sync.
        placeholder = jnp.any(c1 == -1.0) | jnp.any(c2 == -1.0)
        return keep | placeholder

    @classmethod
    def is_valid_config(cls, config) -> None:
        return
