"""Frontend interfaces: stereo depth, dense matching, and the joint frontend.

Behavioral parity with the reference frontend family
(Module/Frontend/{StereoDepth,Matching,Frontend}.py) with a channel-last
layout: depth maps are ``(B,H,W,1)``, flow ``(B,H,W,2)``, flow covariance
``(B,H,W,3)`` with channels ``(sigma_uu, sigma_vv, sigma_uv)``, masks are bool
``(B,H,W,1)``. NaN-padding marks pixels a model cannot predict
(Module/Frontend/Frontend.py:51).

TPU-first notes: implementations are thin hosts around jitted pure functions;
``retrieve_pixels`` is a nearest-neighbor gather that stays on device and is
shape-stable in N so it fuses into the jitted keypoint pipeline.
"""

from __future__ import annotations

import dataclasses
from types import SimpleNamespace
from typing import Optional

import jax.numpy as jnp

from ..data.frame import StereoData, _register
from ..geometry import camera
from ..utils.registry import RegisteredConfigTestable


@_register
@dataclasses.dataclass
class DepthOutput:
    """Dense stereo-depth estimate (reference: Module/Frontend/StereoDepth.py:33-40)."""

    depth: jnp.ndarray                                    # (B,H,W,1) float32
    disparity: Optional[jnp.ndarray] = None               # (B,H,W,1)
    cov: Optional[jnp.ndarray] = None                     # (B,H,W,1) depth variance
    mask: Optional[jnp.ndarray] = None                    # (B,H,W,1) bool
    disparity_uncertainty: Optional[jnp.ndarray] = None   # (B,H,W,1)


@_register
@dataclasses.dataclass
class MatchOutput:
    """Dense optical-flow estimate (reference: Module/Frontend/Matching.py:21-56)."""

    flow: jnp.ndarray                      # (B,H,W,2) float32
    cov: Optional[jnp.ndarray] = None      # (B,H,W,3) (sigma_uu, sigma_vv, sigma_uv)
    mask: Optional[jnp.ndarray] = None     # (B,H,W,1) bool

    @classmethod
    def from_partial_cov(
        cls, flow: jnp.ndarray, cov: jnp.ndarray, mask: Optional[jnp.ndarray] = None
    ) -> "MatchOutput":
        """Zero-fill the off-diagonal sigma_uv channel from a (B,H,W,2) diag cov
        (reference: Matching.py:28-40)."""
        zeros = jnp.zeros(cov.shape[:-1] + (1,), dtype=cov.dtype)
        return cls(flow=flow, cov=jnp.concatenate([cov, zeros], axis=-1), mask=mask)


def retrieve_pixels(
    pixel_uv: jnp.ndarray, scalar_map: Optional[jnp.ndarray]
) -> Optional[jnp.ndarray]:
    """Gather per-keypoint values from a dense map.

    pixel_uv (N,2) in (u,v); scalar_map (B,H,W,C) — batch 0 is used, matching
    the reference (Module/Frontend/Frontend.py:103-118, nearest only). Returns
    (N,C). Out-of-bounds uv are clamped (caller filters with in_bounds masks).
    """
    if scalar_map is None:
        return None
    h, w = scalar_map.shape[1], scalar_map.shape[2]
    u = jnp.clip(pixel_uv[..., 0].astype(jnp.int32), 0, w - 1)
    v = jnp.clip(pixel_uv[..., 1].astype(jnp.int32), 0, h - 1)
    return scalar_map[0, v, u]


class IStereoDepth(RegisteredConfigTestable, register=False):
    """``estimate(frame: StereoData) -> DepthOutput``."""

    Output = DepthOutput

    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config

    @property
    def provide_cov(self) -> bool:
        raise NotImplementedError

    def estimate(self, frame: StereoData) -> DepthOutput:
        raise NotImplementedError

    retrieve_pixels = staticmethod(retrieve_pixels)


class IMatcher(RegisteredConfigTestable, register=False):
    """``estimate(frame_t1, frame_t2) -> MatchOutput`` (left-image flow t1->t2)."""

    Output = MatchOutput

    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config

    @property
    def provide_cov(self) -> bool:
        raise NotImplementedError

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        raise NotImplementedError

    retrieve_pixels = staticmethod(retrieve_pixels)


# -- GT / oracle implementations ------------------------------------------------

class GTDepth(IStereoDepth):
    """Ground-truth depth oracle (reference: StereoDepth.py:82-97)."""

    @property
    def provide_cov(self) -> bool:
        return False

    def estimate(self, frame: StereoData) -> DepthOutput:
        assert frame.gt_depth is not None, "GTDepth requires frames with gt_depth"
        return DepthOutput(depth=frame.gt_depth)

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class GTMatcher(IMatcher):
    """Ground-truth optical-flow oracle (reference: Matching.py:101-117)."""

    @property
    def provide_cov(self) -> bool:
        return False

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        assert frame_t1.gt_flow is not None, "GTMatcher requires frames with gt_flow"
        return MatchOutput(flow=frame_t1.gt_flow, mask=frame_t1.flow_mask)

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class ApplyGTDepthCov(IStereoDepth):
    """Modifier: wrap a depth module; cov := squared error vs ground truth
    (reference: StereoDepth.py:236-265)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.internal = IStereoDepth.instantiate(config.module.type, config.module.args)

    @property
    def provide_cov(self) -> bool:
        return True

    def estimate(self, frame: StereoData) -> DepthOutput:
        assert frame.gt_depth is not None, "ApplyGTDepthCov requires frames with gt_depth"
        out = self.internal.estimate(frame)
        out.cov = jnp.square(frame.gt_depth - out.depth)
        return out

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        IStereoDepth.is_valid_config(config.module)


class ApplyGTMatchCov(IMatcher):
    """Modifier: wrap a matcher; diag cov := squared flow error vs ground truth
    (reference: Matching.py:281-313)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.internal = IMatcher.instantiate(config.module.type, config.module.args)

    @property
    def provide_cov(self) -> bool:
        return True

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        assert frame_t1.gt_flow is not None, "ApplyGTMatchCov requires frames with gt_flow"
        out = self.internal.estimate(frame_t1, frame_t2)
        flow_cov = jnp.square(out.flow - frame_t1.gt_flow)
        return MatchOutput.from_partial_cov(flow=out.flow, cov=flow_cov, mask=out.mask)

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        IMatcher.is_valid_config(config.module)


class ApplyGTMatchMask(IMatcher):
    """Modifier: wrap a matcher; mask := ground-truth flow mask
    (reference: Matching.py:316-340)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.internal = IMatcher.instantiate(config.module.type, config.module.args)

    @property
    def provide_cov(self) -> bool:
        return self.internal.provide_cov

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        assert frame_t1.flow_mask is not None, "ApplyGTMatchMask requires frames with flow_mask"
        out = self.internal.estimate(frame_t1, frame_t2)
        out.mask = frame_t1.flow_mask
        return out

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        IMatcher.is_valid_config(config.module)


# -- Joint frontend --------------------------------------------------------------

class IFrontend(RegisteredConfigTestable, register=False):
    """Joint depth+match estimation (reference: Module/Frontend/Frontend.py:38-118).

    ``estimate_pair(frame_t1, frame_t2) -> (DepthOutput_t2, MatchOutput_t1t2)``;
    ``estimate_depth(frame) -> DepthOutput``. The default ``estimate_triplet``
    composes the two (Frontend.py:81-94); joint networks override it to batch
    all three passes in one forward.
    """

    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config

    @property
    def provide_cov(self) -> tuple[bool, bool]:
        raise NotImplementedError

    def estimate_depth(self, frame: StereoData) -> DepthOutput:
        raise NotImplementedError

    def estimate_pair(
        self, frame_t1: StereoData, frame_t2: StereoData
    ) -> tuple[DepthOutput, MatchOutput]:
        raise NotImplementedError

    def estimate_triplet(
        self, frame_t1: StereoData, frame_t2: StereoData
    ) -> tuple[DepthOutput, DepthOutput, MatchOutput]:
        depth1, match = self.estimate_pair(frame_t1, frame_t2)
        depth0 = self.estimate_depth(frame_t1)
        return depth0, depth1, match

    retrieve_pixels = staticmethod(retrieve_pixels)


class FrontendCompose(IFrontend):
    """Glue an independent IStereoDepth and IMatcher into a frontend
    (reference: Frontend.py:131-156)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.depth = IStereoDepth.instantiate(config.depth.type, config.depth.args)
        self.match = IMatcher.instantiate(config.match.type, config.match.args)

    @property
    def provide_cov(self) -> tuple[bool, bool]:
        return self.depth.provide_cov, self.match.provide_cov

    def estimate_depth(self, frame: StereoData) -> DepthOutput:
        return self.depth.estimate(frame)

    def estimate_pair(
        self, frame_t1: StereoData, frame_t2: StereoData
    ) -> tuple[DepthOutput, MatchOutput]:
        return self.depth.estimate(frame_t2), self.match.estimate(frame_t1, frame_t2)

    @classmethod
    def is_valid_config(cls, config) -> None:
        assert config is not None
        IStereoDepth.is_valid_config(config.depth)
        IMatcher.is_valid_config(config.match)
