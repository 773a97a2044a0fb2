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
    """Shared model host: builds params, jits one padded forward per shape.

    The ENTIRE inference path — padding, forward, unpadding — lives inside one
    jit. One dispatch per call: remote-TPU per-op overhead (and the reference's
    CUDA-launch overhead that motivated its CUDA-Graph variant) never touches
    the per-frame loop.
    """

    def __init__(self, config: SimpleNamespace) -> None:
        self.cfg = FlowFormerConfig(
            decoder_depth=int(getattr(config, "decoder_depth", 12)),
            encoder_dtype=getattr(config, "enc_dtype", "fp32"),
            decoder_dtype=getattr(config, "dec_dtype", "fp32"),
            inference_only=True,
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

    def forward_traced(self, img_a: jnp.ndarray, img_b: jnp.ndarray):
        """Traceable padded forward (usable inside a larger jit)."""
        padder = InputPadder(img_a.shape)
        pa, pb = padder.pad(img_a, img_b)
        out = self.model.apply({"params": self.params}, pa, pb)
        flow = padder.unpad(out["flow_final"])
        cov = padder.unpad(normalize_cov(out["cov_final"]))
        return flow, cov

    def inference(self, img_a: jnp.ndarray, img_b: jnp.ndarray):
        """One-dispatch inference: (B,H,W,3) x2 -> (flow, cov) (B,H,W,2)."""
        shape = tuple(img_a.shape)
        if shape not in self._jitted:
            self._jitted[shape] = jax.jit(self.forward_traced)
        return self._jitted[shape](img_a, img_b)


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


def _traced_flow_to_depth(flow, cov, baseline, fx, enforce_positive: bool) -> DepthOutput:
    disparity = jnp.abs(flow[..., 0:1])
    disparity_cov = cov[..., 0:1]
    depth = disparity_to_depth(disparity, baseline, fx)
    depth_cov = disparity_to_depth_cov(disparity, disparity_cov, baseline, fx)
    mask = (flow[..., 0:1] > 0) if enforce_positive else None
    return DepthOutput(depth=depth, cov=depth_cov, disparity=disparity,
                       disparity_uncertainty=disparity_cov, mask=mask)


class FlowFormerCovFrontend(IFrontend):
    """Joint frontend: one FlowFormerCov forward for depth + matching.

    Each public method is exactly ONE device dispatch: the image batching,
    padded forward, disparity->depth conversion and cov propagation are all
    traced into a single jit (per input shape).
    """

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.runner = _FlowFormerRunner(config)
        self.enforce_positive = bool(getattr(config, "enforce_positive_disparity", False))
        self._jit_cache: dict = {}

    @property
    def provide_cov(self) -> tuple[bool, bool]:
        return True, True

    def _get(self, kind: str, shape: tuple):
        key = (kind, shape)
        if key in self._jit_cache:
            return self._jit_cache[key]
        ep = self.enforce_positive

        if kind == "depth":
            def fn(img_l, img_r, baseline, fx):
                flow, cov = self.runner.forward_traced(img_l, img_r)
                return _traced_flow_to_depth(flow, cov, baseline, fx, ep)
        elif kind == "pair":
            def fn(l1, l2, r2, baseline, fx):
                img_a = jnp.concatenate([l2, l1], axis=0)
                img_b = jnp.concatenate([r2, l2], axis=0)
                flow, cov = self.runner.forward_traced(img_a, img_b)
                depth = _traced_flow_to_depth(flow[0:1], cov[0:1], baseline, fx, ep)
                match = _flow_to_match(flow[1:2], cov[1:2])
                return depth, match
        else:  # triplet
            def fn(l1, r1, l2, r2, baseline, fx):
                img_a = jnp.concatenate([l1, l2, l1], axis=0)
                img_b = jnp.concatenate([r1, r2, l2], axis=0)
                flow, cov = self.runner.forward_traced(img_a, img_b)
                return (
                    _traced_flow_to_depth(flow[0:1], cov[0:1], baseline, fx, ep),
                    _traced_flow_to_depth(flow[1:2], cov[1:2], baseline, fx, ep),
                    _flow_to_match(flow[2:3], cov[2:3]),
                )

        self._jit_cache[key] = jax.jit(fn)
        return self._jit_cache[key]

    def estimate_depth(self, frame: StereoData) -> DepthOutput:
        fn = self._get("depth", tuple(frame.imageL.shape))
        return fn(frame.imageL, frame.imageR,
                  frame.baseline[0], frame.K[0, 0, 0])

    def estimate_pair(self, frame_t1: StereoData, frame_t2: StereoData):
        with timer.cpu_time("Frontend.forward"):
            fn = self._get("pair", tuple(frame_t1.imageL.shape))
            return fn(frame_t1.imageL, frame_t2.imageL, frame_t2.imageR,
                      frame_t2.baseline[0], frame_t2.K[0, 0, 0])

    def estimate_triplet(self, frame_t1: StereoData, frame_t2: StereoData):
        fn = self._get("triplet", tuple(frame_t1.imageL.shape))
        return fn(frame_t1.imageL, frame_t1.imageR, frame_t2.imageL, frame_t2.imageR,
                  frame_t2.baseline[0], frame_t2.K[0, 0, 0])

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
