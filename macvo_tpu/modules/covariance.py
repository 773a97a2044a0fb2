"""ICovariance2to3 module family (reference: Module/Covariance/Project2to3.py).

``estimate(frame, kp (N,2), depth_est, depth_cov (N,)|None, flow_cov (N,3)|None)
-> (N,3,3) float64`` camera-frame covariance per keypoint. Hosts are thin;
the math lives in jitted ops (ops/cov_project.py).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import jax.numpy as jnp

from ..data.frame import StereoData
from ..ops.cov_project import (
    depth_only_covariance,
    gaussian_mixture_covariance,
    match_covariance,
)
from ..utils.logging import Logger
from ..utils.registry import RegisteredConfigTestable
from .frontend import DepthOutput

_POS_NUM = lambda v: isinstance(v, (int, float)) and v > 0
_ODD = lambda v: isinstance(v, int) and v > 0 and v % 2 == 1


class ICovariance2to3(RegisteredConfigTestable, register=False):
    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config

    def estimate(
        self,
        frame: StereoData,
        kp: jnp.ndarray,
        depth_est: DepthOutput,
        depth_cov: Optional[jnp.ndarray],
        flow_cov: Optional[jnp.ndarray],
    ) -> jnp.ndarray:
        raise NotImplementedError


class NoCovariance(ICovariance2to3):
    """Identity covariance for every observation (reference: Project2to3.py:48-57)."""

    def estimate(self, frame, kp, depth_est, depth_cov, flow_cov) -> jnp.ndarray:
        n = kp.shape[0]
        return jnp.broadcast_to(jnp.eye(3, dtype=jnp.float64), (n, 3, 3))

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class DepthCovariance(ICovariance2to3):
    """Depth-only covariance + regularization (reference: Project2to3.py:60-111).

    Note the reference passes the dense cov map where the per-keypoint vector
    is meant (`var_z = depth_est.cov`, Project2to3.py:89) — we implement the
    intended semantics: var_z is the per-keypoint depth variance.
    """

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        if getattr(config, "regularization", None) is None:
            config.regularization = 1e-5
            Logger.info("DepthCovariance: regularization defaulted to 1e-5")

    def estimate(self, frame, kp, depth_est, depth_cov, flow_cov) -> jnp.ndarray:
        assert depth_cov is not None, "DepthCovariance requires per-keypoint depth cov"
        return depth_only_covariance(
            kp, depth_cov.astype(jnp.float64),
            frame.fx, frame.fy, frame.cx, frame.cy, float(self.config.regularization),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "regularization": lambda r: (r is None) or _POS_NUM(r),
        })


class MatchCovariance(ICovariance2to3):
    """MAC-VO covariance model (reference: Project2to3.py:114-191, paper III.C)."""

    def estimate(self, frame, kp, depth_est, depth_cov, flow_cov) -> jnp.ndarray:
        n = kp.shape[0]
        has_flow_cov = flow_cov is not None
        has_depth_cov = depth_cov is not None
        return match_covariance(
            depth_est.depth[0, ..., 0],
            kp.astype(jnp.float32),
            depth_cov if has_depth_cov else jnp.zeros((n,), jnp.float32),
            flow_cov if has_flow_cov else jnp.zeros((n, 3), jnp.float32),
            frame.fx, frame.fy, frame.cx, frame.cy,
            int(self.config.kernel_size),
            float(self.config.match_cov_default),
            float(self.config.min_flow_cov),
            float(self.config.min_depth_cov),
            has_flow_cov, has_depth_cov,
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "kernel_size": _ODD,
            "match_cov_default": _POS_NUM,
            "min_flow_cov": _POS_NUM,
            "min_depth_cov": _POS_NUM,
        })


class GaussianMixtureCovariance(ICovariance2to3):
    """Mixture-of-Gaussians depth statistics variant
    (reference: Project2to3.py:194-275)."""

    def estimate(self, frame, kp, depth_est, depth_cov, flow_cov) -> jnp.ndarray:
        assert depth_est.cov is not None, "GaussianMixtureCovariance needs a dense depth cov map"
        n = kp.shape[0]
        has_flow_cov = flow_cov is not None
        has_depth_cov = depth_cov is not None
        return gaussian_mixture_covariance(
            depth_est.depth[0, ..., 0],
            depth_est.cov[0, ..., 0],
            kp.astype(jnp.float32),
            depth_cov if has_depth_cov else jnp.zeros((n,), jnp.float32),
            flow_cov if has_flow_cov else jnp.zeros((n, 3), jnp.float32),
            frame.fx, frame.fy, frame.cx, frame.cy,
            int(self.config.kernel_size),
            float(self.config.match_cov_default),
            float(self.config.min_flow_cov),
            float(self.config.min_depth_cov),
            has_flow_cov, has_depth_cov,
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "kernel_size": _ODD,
            "match_cov_default": _POS_NUM,
            "min_flow_cov": _POS_NUM,
            "min_depth_cov": _POS_NUM,
        })


class Modifier_Diagonalize(ICovariance2to3):
    """Zero the off-diagonal terms of a wrapped model's output — ablation
    modifier (reference: Project2to3.py:287-309)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.submodule = ICovariance2to3.instantiate(config.type, config.args)

    def estimate(self, frame, kp, depth_est, depth_cov, flow_cov) -> jnp.ndarray:
        covs = self.submodule.estimate(frame, kp, depth_est, depth_cov, flow_cov)
        eye = jnp.eye(3, dtype=covs.dtype)
        return covs * eye

    @classmethod
    def is_valid_config(cls, config) -> None:
        ICovariance2to3.is_valid_config(config)


class Modifier_Normalize(ICovariance2to3):
    """Determinant-normalize a wrapped model's output — ablation modifier
    (reference: Project2to3.py:312-330)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.submodule = ICovariance2to3.instantiate(config.type, config.args)

    def estimate(self, frame, kp, depth_est, depth_cov, flow_cov) -> jnp.ndarray:
        covs = self.submodule.estimate(frame, kp, depth_est, depth_cov, flow_cov)
        det = jnp.linalg.det(covs)
        return covs / det[:, None, None]

    @classmethod
    def is_valid_config(cls, config) -> None:
        ICovariance2to3.is_valid_config(config)
