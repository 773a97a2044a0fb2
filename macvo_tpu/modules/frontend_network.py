"""Learned frontend modules built on FlowFormerCov
(reference: Module/Frontend/Frontend.py:159-261, Matching.py:120-230,
StereoDepth.py:99-185).

``FlowFormerCovFrontend`` runs ONE network for both tasks by batching the
stereo pair and the temporal pair into a single forward (batch 2 for
``estimate_pair``, 3 for ``estimate_triplet`` — reference Frontend.py:218-250).
The whole padded forward is one ``jax.jit`` per input shape; XLA compiles the
entire graph once, which subsumes the reference's CUDA-Graph capture variant
(Frontend.py:264-353, SURVEY.md P3) — there is no separate "CUDAGraph"
frontend here because jit IS that mechanism.

Weights: ``weight`` config is a path to an npz parameter archive (see
models/flowformer/weights.py) or ``"random:<seed>"`` for deterministic random
initialization (no published TPU weights exist; torch weights would need
retraining — SURVEY.md §2.9).
"""

from __future__ import annotations

from functools import partial
from types import SimpleNamespace

import jax
import jax.numpy as jnp

from ..data.frame import StereoData
from ..geometry.camera import disparity_to_depth, disparity_to_depth_cov
from ..models.flowformer import (
    FlowFormerConfig,
    FlowFormerCov,
    InputPadder,
    normalize_cov,
)
from ..models.flowformer.weights import load_params
from ..utils import timer
from .frontend import DepthOutput, IFrontend, IMatcher, IStereoDepth, MatchOutput

_DTYPES = ("fp32", "fp16", "bf16")


class _FlowFormerRunner:
    """Shared model host: builds params, jits one padded forward per shape."""

    def __init__(self, config: SimpleNamespace) -> None:
        self.cfg = FlowFormerConfig(
            decoder_depth=int(getattr(config, "decoder_depth", 12)),
            encoder_dtype=getattr(config, "enc_dtype", "fp32"),
            decoder_dtype=getattr(config, "dec_dtype", "fp32"),
        )
        self.model = FlowFormerCov(self.cfg)
        self.params = self._load_weights(str(config.weight))
        self._jitted: dict[tuple, object] = {}

    def _load_weights(self, weight: str):
        probe = jnp.zeros((1, 64, 64, 3), jnp.float32)
        if weight.startswith("random"):
            seed = int(weight.split(":")[1]) if ":" in weight else 0
            return self.model.init(jax.random.PRNGKey(seed), probe, probe)["params"]
        template = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), probe, probe)["params"]
        )
        return load_params(weight, template)

    def _forward(self, shape) -> object:
        if shape not in self._jitted:
            @jax.jit
            def fn(params, img_a, img_b):
                out = self.model.apply({"params": params}, img_a, img_b)
                return out["flow_final"], normalize_cov(out["cov_final"])

            self._jitted[shape] = fn
        return self._jitted[shape]

    def inference(self, img_a: jnp.ndarray, img_b: jnp.ndarray):
        """Padded inference: (B,H,W,3) x2 -> (flow (B,H,W,2), cov (B,H,W,2))."""
        padder = InputPadder(img_a.shape)
        pa, pb = padder.pad(img_a, img_b)
        flow, cov = self._forward(pa.shape)(self.params, pa, pb)
        return padder.unpad(flow), padder.unpad(cov)


def _flow_to_depth(
    flow: jnp.ndarray, cov: jnp.ndarray, frame: StereoData, enforce_positive: bool
) -> DepthOutput:
    """Stereo (L->R) flow -> depth: disparity = |flow_u|
    (reference: Frontend.py:183-194)."""
    disparity = jnp.abs(flow[..., 0:1])
    disparity_cov = cov[..., 0:1]
    depth = disparity_to_depth(disparity, frame.frame_baseline, frame.fx)
    depth_cov = disparity_to_depth_cov(disparity, disparity_cov, frame.frame_baseline, frame.fx)
    mask = (flow[..., 0:1] > 0) if enforce_positive else None
    return DepthOutput(
        depth=depth, cov=depth_cov, disparity=disparity,
        disparity_uncertainty=disparity_cov, mask=mask,
    )


def _flow_to_match(flow: jnp.ndarray, cov: jnp.ndarray) -> MatchOutput:
    return MatchOutput.from_partial_cov(flow=flow, cov=cov)


class FlowFormerCovFrontend(IFrontend):
    """Joint frontend: one FlowFormerCov forward for depth + matching."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.runner = _FlowFormerRunner(config)
        self.enforce_positive = bool(getattr(config, "enforce_positive_disparity", False))

    @property
    def provide_cov(self) -> tuple[bool, bool]:
        return True, True

    def estimate_depth(self, frame: StereoData) -> DepthOutput:
        flow, cov = self.runner.inference(frame.imageL, frame.imageR)
        return _flow_to_depth(flow, cov, frame, self.enforce_positive)

    def estimate_pair(self, frame_t1: StereoData, frame_t2: StereoData):
        with timer.cpu_time("Frontend.forward"):
            img_a = jnp.concatenate([frame_t2.imageL, frame_t1.imageL], axis=0)
            img_b = jnp.concatenate([frame_t2.imageR, frame_t2.imageL], axis=0)
            flow, cov = self.runner.inference(img_a, img_b)
        return (
            _flow_to_depth(flow[0:1], cov[0:1], frame_t2, self.enforce_positive),
            _flow_to_match(flow[1:2], cov[1:2]),
        )

    def estimate_triplet(self, frame_t1: StereoData, frame_t2: StereoData):
        img_a = jnp.concatenate([frame_t1.imageL, frame_t2.imageL, frame_t1.imageL], axis=0)
        img_b = jnp.concatenate([frame_t1.imageR, frame_t2.imageR, frame_t2.imageL], axis=0)
        flow, cov = self.runner.inference(img_a, img_b)
        return (
            _flow_to_depth(flow[0:1], cov[0:1], frame_t1, self.enforce_positive),
            _flow_to_depth(flow[1:2], cov[1:2], frame_t2, self.enforce_positive),
            _flow_to_match(flow[2:3], cov[2:3]),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "weight": lambda s: isinstance(s, str),
            "dec_dtype": lambda s: s in _DTYPES,
            "enc_dtype": lambda s: s in _DTYPES,
            "enforce_positive_disparity": lambda b: isinstance(b, bool),
            "decoder_depth": lambda v: isinstance(v, int),
        })


class FlowFormerMatcher(IMatcher):
    """Flow-only matcher (no covariance) (reference: Matching.py:120-155)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.runner = _FlowFormerRunner(config)

    @property
    def provide_cov(self) -> bool:
        return False

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        flow, _ = self.runner.inference(frame_t1.imageL, frame_t2.imageL)
        return MatchOutput(flow=flow)

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"weight": lambda s: isinstance(s, str)})


class FlowFormerCovMatcher(IMatcher):
    """Joint flow + covariance matcher (reference: Matching.py:157-196)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.runner = _FlowFormerRunner(config)

    @property
    def provide_cov(self) -> bool:
        return True

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        flow, cov = self.runner.inference(frame_t1.imageL, frame_t2.imageL)
        return MatchOutput.from_partial_cov(flow=flow, cov=cov)

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"weight": lambda s: isinstance(s, str)})


class FlowFormerDepth(IStereoDepth):
    """Stereo depth from FlowFormer flow, no cov (reference: StereoDepth.py:99-136)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.runner = _FlowFormerRunner(config)

    @property
    def provide_cov(self) -> bool:
        return False

    def estimate(self, frame: StereoData) -> DepthOutput:
        flow, _ = self.runner.inference(frame.imageL, frame.imageR)
        disparity = jnp.abs(flow[..., 0:1])
        depth = disparity_to_depth(disparity, frame.frame_baseline, frame.fx)
        return DepthOutput(depth=depth, disparity=disparity)

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"weight": lambda s: isinstance(s, str)})


class FlowFormerCovDepth(IStereoDepth):
    """Stereo depth + cov from FlowFormerCov (reference: StereoDepth.py:138-183)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.runner = _FlowFormerRunner(config)
        self.enforce_positive = bool(getattr(config, "enforce_positive_disparity", False))

    @property
    def provide_cov(self) -> bool:
        return True

    def estimate(self, frame: StereoData) -> DepthOutput:
        flow, cov = self.runner.inference(frame.imageL, frame.imageR)
        return _flow_to_depth(flow, cov, frame, self.enforce_positive)

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"weight": lambda s: isinstance(s, str)})
