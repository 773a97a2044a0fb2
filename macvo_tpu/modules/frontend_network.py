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

import json
from functools import partial
from pathlib import Path
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
        self.calib = self._load_calib(getattr(config, "cov_calib", "auto"),
                                      str(config.weight))
        # fp32 means fp32: on TPU an f32-typed matmul runs reduced-precision
        # MXU passes unless HIGHEST is requested, which was the entire 4.7x
        # TPU-vs-CPU E2E ATE gap (evidence/tpu_cpu_gap_r5.json: flow matches
        # CPU to ~2e-5 px at HIGHEST vs 0.01-0.04 px at default). bf16/fp16
        # configs keep the fast default — that's what those dtypes mean.
        # Override with config matmul_precision: default|high|highest.
        both_fp32 = (self.cfg.encoder_dtype == "fp32"
                     and self.cfg.decoder_dtype == "fp32")
        self.matmul_precision = getattr(
            config, "matmul_precision", "highest" if both_fp32 else "default")
        self._jitted: dict[tuple, object] = {}

    def _precision_wrap(self, fn):
        """Trace ``fn`` under the configured matmul precision (the context
        must be active at TRACE time; jit callers wrap BEFORE jitting)."""
        if self.matmul_precision == "default":
            return fn

        def wrapped(*args):
            with jax.default_matmul_precision(self.matmul_precision):
                return fn(*args)

        return wrapped

    def _load_weights(self, weight: str):
        probe = jnp.zeros((1, 64, 64, 3), jnp.float32)
        if weight.startswith("random"):
            seed = int(weight.split(":")[1]) if ":" in weight else 0
            return self.model.init(jax.random.PRNGKey(seed), probe, probe)["params"]
        template = jax.eval_shape(
            lambda: self.model.init(jax.random.PRNGKey(0), probe, probe)["params"]
        )
        return load_params(weight, template)

    def _load_calib(self, calib, weight: str):
        """Optional post-hoc covariance recalibration: per-log-sigma-band
        variance temperatures fitted on a HOLDOUT world by
        scripts/fit_cov_temperature.py (VERDICT r4 next-round #4 — the raw
        NLL-trained head is well calibrated at the median but overconfident
        in the tails). ``"auto"`` loads ``<weight>.calib.json`` when present;
        a path loads that file; ``"none"``/None disables."""
        if calib in (None, "none", ""):
            return None
        path = Path(weight).with_suffix(".calib.json") if calib == "auto" else Path(calib)
        if not path.exists():
            if calib != "auto":
                raise FileNotFoundError(f"cov_calib file not found: {path}")
            return None
        rec = json.loads(path.read_text())
        return (jnp.asarray(rec["log10_sigma_edges"], jnp.float32),
                jnp.asarray(rec["tau2"], jnp.float32))

    def _recalibrate(self, cov: jnp.ndarray) -> jnp.ndarray:
        """Scale the predicted variance by the fitted band temperature
        (both channels and, downstream, sigma_uv scale together — the
        correlation structure is preserved)."""
        if self.calib is None:
            return cov
        edges, tau2 = self.calib
        sigma2 = 0.5 * (cov[..., 0] + cov[..., 1])
        idx = jnp.searchsorted(edges, 0.5 * jnp.log10(jnp.maximum(sigma2, 1e-24)))
        return cov * tau2[idx][..., None].astype(cov.dtype)

    def forward_traced(self, img_a: jnp.ndarray, img_b: jnp.ndarray):
        """Traceable padded forward (usable inside a larger jit)."""
        padder = InputPadder(img_a.shape)
        pa, pb = padder.pad(img_a, img_b)
        out = self.model.apply({"params": self.params}, pa, pb)
        flow = padder.unpad(out["flow_final"])
        cov = self._recalibrate(padder.unpad(normalize_cov(out["cov_final"])))
        return flow, cov

    # -- feature-level entry points (device-resident feature cache) --------
    def _apply(self, method: str, *args):
        return self.model.apply({"params": self.params}, *args, method=method)

    def _decode_unpad(self, padder, feat_a, feat_b, ctx):
        out = self._apply("decode", feat_a, feat_b, ctx)
        flow = padder.unpad(out["flow_final"])
        cov = self._recalibrate(padder.unpad(normalize_cov(out["cov_final"])))
        return flow, cov

    def depth_traced(self, img_l: jnp.ndarray, img_r: jnp.ndarray):
        """Stereo-only forward that also returns the left image's encoder
        features (seeds the VO frontend's cross-frame cache)."""
        padder = InputPadder(img_l.shape)
        pl, pr = padder.pad(img_l, img_r)
        f_l, f_r = jnp.split(self._apply("features", jnp.concatenate([pl, pr], 0)), 2, 0)
        c_l = self._apply("context", pl)
        flow, cov = self._decode_unpad(padder, f_l, f_r, c_l)
        return flow, cov, (f_l, c_l)

    def pair_cold_traced(self, l1: jnp.ndarray, l2: jnp.ndarray, r2: jnp.ndarray):
        """Flow(l1->l2) + stereo(l2->r2) with no cache: encode all three
        images, share fnet(l2) between the two pairs, return l2's features."""
        padder = InputPadder(l1.shape)
        pl1, pl2, pr2 = padder.pad(l1, l2, r2)
        feats = self._apply("features", jnp.concatenate([pl1, pl2, pr2], 0))
        f_l1, f_l2, f_r2 = jnp.split(feats, 3, 0)
        c_l2, c_l1 = jnp.split(self._apply("context", jnp.concatenate([pl2, pl1], 0)), 2, 0)
        flow, cov = self._decode_unpad(
            padder,
            jnp.concatenate([f_l2, f_l1], 0),
            jnp.concatenate([f_r2, f_l2], 0),
            jnp.concatenate([c_l2, c_l1], 0),
        )
        return flow, cov, (f_l2, c_l2)

    def pair_cached_traced(self, l2, r2, f_l1, c_l1):
        """Flow(l1->l2) + stereo(l2->r2) reusing the PREVIOUS frame's cached
        fnet/cnet outputs for l1: only the two genuinely new images (l2, r2)
        are encoded — half the Twins work of the cold path, identical math."""
        padder = InputPadder(l2.shape)
        pl2, pr2 = padder.pad(l2, r2)
        f_l2, f_r2 = jnp.split(self._apply("features", jnp.concatenate([pl2, pr2], 0)), 2, 0)
        c_l2 = self._apply("context", pl2)
        flow, cov = self._decode_unpad(
            padder,
            jnp.concatenate([f_l2, f_l1], 0),
            jnp.concatenate([f_r2, f_l2], 0),
            jnp.concatenate([c_l2, c_l1], 0),
        )
        return flow, cov, (f_l2, c_l2)

    def inference(self, img_a: jnp.ndarray, img_b: jnp.ndarray):
        """One-dispatch inference: (B,H,W,3) x2 -> (flow, cov) (B,H,W,2)."""
        shape = tuple(img_a.shape)
        if shape not in self._jitted:
            self._jitted[shape] = jax.jit(self._precision_wrap(self.forward_traced))
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
        # Cross-frame encoder cache: (source StereoData, fnet feats, cnet ctx)
        # of the most recent frame. The strong reference to the StereoData
        # keeps its id() valid for the identity check on the next call.
        self._feat_cache: tuple | None = None

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
                flow, cov, cache = self.runner.depth_traced(img_l, img_r)
                return _traced_flow_to_depth(flow, cov, baseline, fx, ep), cache
        elif kind == "pair_cold":
            def fn(l1, l2, r2, baseline, fx):
                flow, cov, cache = self.runner.pair_cold_traced(l1, l2, r2)
                depth = _traced_flow_to_depth(flow[0:1], cov[0:1], baseline, fx, ep)
                match = _flow_to_match(flow[1:2], cov[1:2])
                return depth, match, cache
        elif kind == "pair_cached":
            def fn(l2, r2, f_l1, c_l1, baseline, fx):
                flow, cov, cache = self.runner.pair_cached_traced(l2, r2, f_l1, c_l1)
                depth = _traced_flow_to_depth(flow[0:1], cov[0:1], baseline, fx, ep)
                match = _flow_to_match(flow[1:2], cov[1:2])
                return depth, match, cache
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

        self._jit_cache[key] = jax.jit(self.runner._precision_wrap(fn))
        return self._jit_cache[key]

    def estimate_depth(self, frame: StereoData) -> DepthOutput:
        fn = self._get("depth", tuple(frame.imageL.shape))
        depth, cache = fn(frame.imageL, frame.imageR,
                          frame.baseline[0], frame.K[0, 0, 0])
        self._feat_cache = (frame, *cache)
        return depth

    def estimate_pair(self, frame_t1: StereoData, frame_t2: StereoData):
        with timer.cpu_time("Frontend.forward"):
            shape = tuple(frame_t1.imageL.shape)
            cache = self._feat_cache
            if cache is not None and cache[0] is frame_t1:
                # Steady state: frame_t1's features were produced by the
                # previous call — only encode the two new images.
                fn = self._get("pair_cached", shape)
                depth, match, new_cache = fn(
                    frame_t2.imageL, frame_t2.imageR, cache[1], cache[2],
                    frame_t2.baseline[0], frame_t2.K[0, 0, 0])
            else:
                fn = self._get("pair_cold", shape)
                depth, match, new_cache = fn(
                    frame_t1.imageL, frame_t2.imageL, frame_t2.imageR,
                    frame_t2.baseline[0], frame_t2.K[0, 0, 0])
            self._feat_cache = (frame_t2, *new_cache)
            return depth, match

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
