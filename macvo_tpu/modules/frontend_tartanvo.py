"""TartanVO-family frontend modules + learned motion model.

Wraps the flax TartanVO networks as MAC-VO modules with the reference's
adapter conventions (Module/Frontend/Matching.py:199-278,
StereoDepth.py:186-233, Module/MotionModel.py:90-123): images are center-
cropped to /64 multiples, network outputs are NaN-padded back to full
resolution with a validity mask over the crop margin, flow is un-normalized
by ``1/flow_norm`` and upsampled x4.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import jax
import jax.numpy as jnp

from ..data.frame import StereoData, StereoFrame
from ..geometry import se3
from ..geometry.camera import disparity_to_depth, disparity_to_depth_cov
from ..models.flowformer.weights import load_params
from ..models.tartanvo import (
    FLOW_NORM,
    POSE_DEPTH_NORM,
    POSE_NORM,
    POSENET_SIZE,
    STEREO_NORM,
    PWCFlowNet,
    RAFTFlowCovNet,
    StereoCovNet,
    VOFlowRes,
    make_intrinsics_layer,
    normalize_image,
    resize_bilinear,
)
from .frontend import DepthOutput, IMatcher, IStereoDepth, MatchOutput
from .motion import IMotionModel


def _crop_margins(h: int, w: int, factor: int = 64) -> tuple[int, int, int, int]:
    h64, w64 = (h // factor) * factor, (w // factor) * factor
    mh, mw = (h - h64) // 2, (w - w64) // 2
    return mh, mw, h64, w64


def _nan_pad(x: jnp.ndarray, h: int, w: int, mh: int, mw: int) -> jnp.ndarray:
    """Pad a cropped (B,h64,w64,C) map back to (B,H,W,C) with NaN margins
    (the reference convention, Module/Frontend/Frontend.py:51)."""
    return jnp.pad(
        x,
        ((0, 0), (mh, h - mh - x.shape[1]), (mw, w - mw - x.shape[2]), (0, 0)),
        constant_values=jnp.nan,
    )


def _margin_mask(h: int, w: int, mh: int, mw: int, h64: int, w64: int) -> jnp.ndarray:
    mask = jnp.zeros((1, h, w, 1), bool)
    return mask.at[:, mh : mh + h64, mw : mw + w64].set(True)


class _ModelHost:
    """Init-or-load params + per-shape jit cache for a flax module."""

    def __init__(self, model, weight: str, probe_shapes) -> None:
        self.model = model
        if weight.startswith("random"):
            from ..utils.logging import Logger

            Logger.warning(
                f"{type(model).__name__}: RANDOM weights ({weight}) — no trained "
                "TartanVO-family checkpoint exists in this snapshot; outputs are "
                "not meaningful as a baseline (PARITY.md row 27)")
            seed = int(weight.split(":")[1]) if ":" in weight else 0
            self.params = model.init(jax.random.PRNGKey(seed), *[
                jnp.zeros(s, jnp.float32) for s in probe_shapes
            ])["params"]
        else:
            template = jax.eval_shape(
                lambda: model.init(jax.random.PRNGKey(0), *[
                    jnp.zeros(s, jnp.float32) for s in probe_shapes
                ])["params"]
            )
            self.params = load_params(weight, template)
        self._jit = jax.jit(lambda params, *a: self.model.apply({"params": params}, *a))

    def __call__(self, *args):
        return self._jit(self.params, *args)


class TartanVOMatcher(IMatcher):
    """PWC flow matcher with crop-margin mask (reference: Matching.py:199-230)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.host = _ModelHost(PWCFlowNet(), str(config.weight),
                               [(1, 64, 64, 3), (1, 64, 64, 3)])

    @property
    def provide_cov(self) -> bool:
        return False

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        h, w = frame_t1.height, frame_t1.width
        mh, mw, h64, w64 = _crop_margins(h, w)
        img1 = normalize_image(frame_t1.imageL[:, mh : mh + h64, mw : mw + w64])
        img2 = normalize_image(frame_t2.imageL[:, mh : mh + h64, mw : mw + w64])
        flow_q = self.host(img1, img2) / FLOW_NORM          # 1/4 res
        flow = resize_bilinear(flow_q, (h64, w64))
        return MatchOutput(
            flow=_nan_pad(flow, h, w, mh, mw),
            mask=_margin_mask(h, w, mh, mw, h64, w64),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"weight": lambda s: isinstance(s, str)})


class TartanVOCovMatcher(IMatcher):
    """PWC flow + RAFT-style recurrent cov (reference: Matching.py:233-278)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.host = _ModelHost(RAFTFlowCovNet(), str(config.weight),
                               [(1, 64, 64, 3), (1, 64, 64, 3)])

    @property
    def provide_cov(self) -> bool:
        return True

    def estimate(self, frame_t1: StereoData, frame_t2: StereoData) -> MatchOutput:
        h, w = frame_t1.height, frame_t1.width
        mh, mw, h64, w64 = _crop_margins(h, w)
        img1 = normalize_image(frame_t1.imageL[:, mh : mh + h64, mw : mw + w64])
        img2 = normalize_image(frame_t2.imageL[:, mh : mh + h64, mw : mw + w64])
        flow_q, log_sigma = self.host(img1, img2)
        flow = resize_bilinear(flow_q / FLOW_NORM, (h64, w64))
        cov = resize_bilinear(jnp.exp(2.0 * log_sigma[-1]), (h64, w64))
        return MatchOutput.from_partial_cov(
            flow=_nan_pad(flow, h, w, mh, mw),
            cov=_nan_pad(cov, h, w, mh, mw),
            mask=_margin_mask(h, w, mh, mw, h64, w64),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"weight": lambda s: isinstance(s, str)})


class TartanVODepth(IStereoDepth):
    """Hourglass stereo depth with optional cov decoder
    (reference: StereoDepth.py:186-233 via StereoCovNet)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.host = _ModelHost(StereoCovNet(), str(config.weight),
                               [(1, 64, 64, 3), (1, 64, 64, 3)])
        self.use_cov = getattr(config, "cov_mode", "None") == "Est"

    @property
    def provide_cov(self) -> bool:
        return self.use_cov

    def estimate(self, frame: StereoData) -> DepthOutput:
        h, w = frame.height, frame.width
        mh, mw, h64, w64 = _crop_margins(h, w)
        img_l = normalize_image(frame.imageL[:, mh : mh + h64, mw : mw + w64])
        img_r = normalize_image(frame.imageR[:, mh : mh + h64, mw : mw + w64])
        disparity, disparity_cov = self.host(img_l, img_r)
        depth = disparity_to_depth(disparity, frame.frame_baseline, frame.fx)
        out_depth = _nan_pad(depth, h, w, mh, mw)
        mask = _margin_mask(h, w, mh, mw, h64, w64)
        if self.use_cov:
            depth_cov = disparity_to_depth_cov(
                disparity, disparity_cov, frame.frame_baseline, frame.fx
            )
            return DepthOutput(
                depth=out_depth,
                cov=_nan_pad(depth_cov, h, w, mh, mw),
                disparity=_nan_pad(disparity, h, w, mh, mw),
                disparity_uncertainty=_nan_pad(disparity_cov, h, w, mh, mw),
                mask=mask,
            )
        return DepthOutput(depth=out_depth, disparity=_nan_pad(disparity, h, w, mh, mw), mask=mask)

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {
            "weight": lambda s: isinstance(s, str),
            "cov_mode": lambda s: s in ("Est", "None"),
        })


class TartanMotionNet(IMotionModel):
    """Learned motion prior: VOFlowRes on (flow, norm inv-depth, intrinsics)
    resized to 112x160, se3 output scaled by pose_norm
    (reference: MotionModel.py:90-123, StereoVO_Interface.py:154-194)."""

    def __init__(self, config: SimpleNamespace) -> None:
        super().__init__(config)
        self.host = _ModelHost(VOFlowRes(), str(config.weight), [(1, 112, 160, 5)])
        self.prev_pose: Optional[jnp.ndarray] = None

    def predict(self, frame: StereoFrame, flow, depth) -> jnp.ndarray:
        if self.prev_pose is None:
            self.prev_pose = se3.identity()
            return self.prev_pose
        assert flow is not None and depth is not None, "TartanMotionNet needs flow+depth"
        meta = frame.stereo
        th, tw = POSENET_SIZE
        intr = make_intrinsics_layer(meta.height, meta.width, meta.fx, meta.fy, meta.cx, meta.cy)
        intr = resize_bilinear(intr[None], (th, tw))
        flow_r = resize_bilinear(jnp.nan_to_num(flow), (th, tw)) * FLOW_NORM
        depth_r = resize_bilinear(jnp.nan_to_num(depth, nan=1e6), (th, tw))
        blfx = meta.frame_baseline * meta.fx
        stereo = jnp.clip(jnp.nan_to_num(blfx / depth_r * STEREO_NORM), 0.0, None)
        # cap at 0.5 m depth: degenerate near-camera pixels (possible in the
        # randomized worlds, never in real capture) otherwise saturate the
        # input stack; matches the training-time cap (scripts/train_posenet.py)
        inv_depth = jnp.minimum(stereo / blfx / STEREO_NORM, 2.0) / POSE_DEPTH_NORM
        stack = jnp.concatenate([flow_r, inv_depth, intr], axis=-1)
        twist = self.host(stack)[0] * jnp.asarray(POSE_NORM)
        # Network emits [trans, rot]; our se3 twists are [rho, phi] — same order.
        new_pose = se3.mul(self.prev_pose, se3.exp(twist))
        self.prev_pose = new_pose
        return new_pose

    def update(self, pose: jnp.ndarray) -> None:
        self.prev_pose = pose

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(config, {"weight": lambda s: isinstance(s, str)})
