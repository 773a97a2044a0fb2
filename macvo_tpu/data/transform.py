"""Frame preprocessing transforms (reference: DataLoader/Transform.py:18-209).

Host-side numpy/cv2 ops applied per frame before device transfer: resizing
rescales intrinsics and dense ground truth (flow *values* scale with the
image), cropping shifts the principal point, plus sensor-noise injection and
dtype casting. ``SmartResizeFrame`` = aspect-preserving scale then center-crop
to a target shape (used to fit KITTI / VBR resolutions).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import cv2
import numpy as np

from ..utils.registry import RegisteredConfigTestable
from .frame import StereoData, StereoFrame


class IDataTransform(RegisteredConfigTestable, register=False):
    def __init__(self, config: SimpleNamespace | dict | None = None) -> None:
        if isinstance(config, dict):
            config = SimpleNamespace(**config)
        self.config = config

    def __call__(self, frame: StereoFrame) -> StereoFrame:
        raise NotImplementedError


def _resize_batch(images: np.ndarray, w: int, h: int, interp=cv2.INTER_LINEAR) -> np.ndarray:
    """(B,H,W,C) or (B,H,W) resize via cv2, preserving batch and channels."""
    squeeze = images.ndim == 3
    if squeeze:
        images = images[..., None]
    out = np.stack(
        [cv2.resize(img, (w, h), interpolation=interp) for img in images], axis=0
    )
    if out.ndim == 3:
        out = out[..., None]
    return out[..., 0] if squeeze else out


def _interp_flag(config) -> int:
    """Map the config's ``interp`` key (reference key, values
    nearest/bilinear) to a cv2 flag. The legacy ``interpolate`` key is also
    accepted."""
    name = getattr(config, "interp", getattr(config, "interpolate", "bilinear"))
    return cv2.INTER_NEAREST if name == "nearest" else cv2.INTER_LINEAR


class ScaleFrame(IDataTransform):
    """Resize the frame DOWN by a factor: target size = original / scale
    (matches reference Transform.py:62-66 — ``scale_u: 2.0`` halves the
    width). K and flow values divide by the *rounded* scale recomputed from
    the integer target size (reference: Transform.py:41-94)."""

    def __call__(self, frame: StereoFrame) -> StereoFrame:
        su, sv = float(self.config.scale_u), float(self.config.scale_v)
        interp = _interp_flag(self.config)
        s = frame.stereo
        H, W = s.imageL.shape[1:3]
        new_w, new_h = int(W / su), int(H / sv)
        # The achievable scale after integer rounding — K/flow must rescale by
        # THIS, not the requested factor (reference: Transform.py:65-72).
        round_su, round_sv = W / new_w, H / new_h
        K = np.asarray(s.K) / np.array(
            [[round_su, 1.0, round_su], [1.0, round_sv, round_sv], [1.0, 1.0, 1.0]],
            dtype=np.float32,
        )

        def rs(x, nearest=False):
            if x is None:
                return None
            return _resize_batch(np.asarray(x), new_w, new_h, cv2.INTER_NEAREST if nearest else interp)

        gt_flow = rs(s.gt_flow)
        if gt_flow is not None:
            gt_flow = gt_flow / np.array([round_su, round_sv], dtype=np.float32)
        flow_mask = rs(s.flow_mask, nearest=True)
        return StereoFrame(
            idx=frame.idx,
            gt_pose=frame.gt_pose,
            stereo=StereoData(
                T_BS=s.T_BS,
                K=K.astype(np.float32),
                baseline=s.baseline,
                time_ns=s.time_ns,
                imageL=rs(s.imageL),
                imageR=rs(s.imageR),
                gt_flow=gt_flow,
                flow_mask=flow_mask,
                gt_depth=rs(s.gt_depth, nearest=True),
            ),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(
            config,
            {
                "scale_u": lambda v: isinstance(v, (int, float)) and v > 0,
                "scale_v": lambda v: isinstance(v, (int, float)) and v > 0,
            },
        )
        _check_interp_key(config)


def _check_interp_key(config) -> None:
    name = getattr(config, "interp", getattr(config, "interpolate", "bilinear"))
    assert name in ("nearest", "bilinear", "linear"), f"bad interp mode {name!r}"


class CenterCropFrame(IDataTransform):
    """Center-crop to (width, height); principal point shifts by the crop
    offset (reference: Transform.py:97-133)."""

    def __call__(self, frame: StereoFrame) -> StereoFrame:
        tw, th = int(self.config.width), int(self.config.height)
        s = frame.stereo
        H, W = s.imageL.shape[1:3]
        off_u, off_v = (W - tw) // 2, (H - th) // 2
        assert off_u >= 0 and off_v >= 0, f"crop {tw}x{th} larger than image {W}x{H}"

        def crop(x):
            if x is None:
                return None
            return np.asarray(x)[:, off_v : off_v + th, off_u : off_u + tw]

        K = np.asarray(s.K).copy()
        K[:, 0, 2] -= off_u
        K[:, 1, 2] -= off_v
        return StereoFrame(
            idx=frame.idx,
            gt_pose=frame.gt_pose,
            stereo=StereoData(
                T_BS=s.T_BS,
                K=K,
                baseline=s.baseline,
                time_ns=s.time_ns,
                imageL=crop(s.imageL),
                imageR=crop(s.imageR),
                gt_flow=crop(s.gt_flow),
                flow_mask=crop(s.flow_mask),
                gt_depth=crop(s.gt_depth),
            ),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(
            config,
            {
                "width": lambda v: isinstance(v, int) and v > 0,
                "height": lambda v: isinstance(v, int) and v > 0,
            },
        )


class AddImageNoise(IDataTransform):
    """Additive Gaussian pixel noise on both images — fault injection for
    robustness studies (reference: Transform.py:136-150)."""

    def __call__(self, frame: StereoFrame) -> StereoFrame:
        stdv = float(self.config.stdv)
        rng = np.random.default_rng(abs(hash(int(frame.idx[0]))) % (2**31))
        s = frame.stereo

        def noisy(img):
            n = rng.normal(0.0, stdv, size=img.shape).astype(np.float32)
            return np.clip(np.asarray(img) + n, 0.0, 1.0)

        return StereoFrame(
            idx=frame.idx,
            gt_pose=frame.gt_pose,
            stereo=StereoData(
                T_BS=s.T_BS, K=s.K, baseline=s.baseline, time_ns=s.time_ns,
                imageL=noisy(s.imageL), imageR=noisy(s.imageR),
                gt_flow=s.gt_flow, flow_mask=s.flow_mask, gt_depth=s.gt_depth,
            ),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(
            config, {"stdv": lambda v: isinstance(v, (int, float)) and v >= 0}
        )


class PhotometricJitter(IDataTransform):
    """Random per-call brightness/contrast/gamma/color-gain jitter (train-time
    augmentation; the RAFT/FlowFormer recipe the reference inherits through
    its pretrained torch weights). Called independently per frame by
    TrainPairDataset, so the two frames of a pair receive DIFFERENT
    photometric params — the asymmetric jitter that teaches the matcher
    brightness-constancy violations.

    Config: strength in [0,1] scales all jitter ranges (default 1).
    GT (flow/depth/pose/K) is untouched."""

    def __call__(self, frame: StereoFrame) -> StereoFrame:
        k = float(getattr(self.config, "strength", 1.0) if self.config else 1.0)
        rng = np.random.default_rng()
        s = frame.stereo

        def jitter(img):
            img = np.asarray(img, np.float32)
            gain = 1.0 + rng.uniform(-0.3, 0.3) * k
            bias = rng.uniform(-0.12, 0.12) * k
            gamma = np.exp(rng.uniform(-0.35, 0.35) * k)
            color = 1.0 + rng.uniform(-0.15, 0.15, size=3).astype(np.float32) * k
            out = np.clip(img * gain * color + bias, 1e-4, 1.0) ** gamma
            # random mild defocus: real cameras are never pixel-sharp, and a
            # matcher trained only on razor-sharp renders over-trusts
            # single-pixel gradients
            if rng.random() < 0.5 * k:
                sigma = rng.uniform(0.4, 1.2)
                out = np.stack([cv2.GaussianBlur(b, (0, 0), sigma) for b in out], 0)
            return np.clip(out, 0.0, 1.0).astype(np.float32)

        return StereoFrame(
            idx=frame.idx,
            gt_pose=frame.gt_pose,
            stereo=StereoData(
                T_BS=s.T_BS, K=s.K, baseline=s.baseline, time_ns=s.time_ns,
                imageL=jitter(s.imageL), imageR=jitter(s.imageR),
                gt_flow=s.gt_flow, flow_mask=s.flow_mask, gt_depth=s.gt_depth,
            ),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        if config is not None and hasattr(config, "strength"):
            assert isinstance(config.strength, (int, float)) and 0 <= config.strength <= 2


class CastDataType(IDataTransform):
    """Cast image arrays to a given dtype (reference: Transform.py:153-178)."""

    _DTYPES = {"float32": np.float32, "float16": np.float16, "bfloat16": None}

    def __call__(self, frame: StereoFrame) -> StereoFrame:
        dtype_name = self.config.dtype
        if dtype_name == "bfloat16":
            import ml_dtypes

            dtype = ml_dtypes.bfloat16
        else:
            dtype = self._DTYPES[dtype_name]
        s = frame.stereo
        return StereoFrame(
            idx=frame.idx,
            gt_pose=frame.gt_pose,
            stereo=StereoData(
                T_BS=s.T_BS, K=s.K, baseline=s.baseline, time_ns=s.time_ns,
                imageL=np.asarray(s.imageL).astype(dtype),
                imageR=np.asarray(s.imageR).astype(dtype),
                gt_flow=s.gt_flow, flow_mask=s.flow_mask, gt_depth=s.gt_depth,
            ),
        )

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(
            config, {"dtype": lambda v: v in ("float32", "float16", "bfloat16")}
        )


class SmartResizeFrame(IDataTransform):
    """Aspect-preserving scale then center-crop to exactly (width, height)
    (reference: Transform.py:181-209)."""

    def __call__(self, frame: StereoFrame) -> StereoFrame:
        tw, th = int(self.config.width), int(self.config.height)
        H, W = frame.stereo.imageL.shape[1:3]
        # Divide-factor convention: scale by the SMALLER shrink so both target
        # dims stay covered, then crop (reference: Transform.py:198-207).
        factor = min(H / th, W / tw)
        scale = ScaleFrame(SimpleNamespace(
            scale_u=factor, scale_v=factor,
            interp=getattr(self.config, "interp",
                           getattr(self.config, "interpolate", "bilinear"))))
        crop = CenterCropFrame(SimpleNamespace(width=tw, height=th))
        return crop(scale(frame))

    @classmethod
    def is_valid_config(cls, config) -> None:
        cls._enforce_config_spec(
            config,
            {
                "width": lambda v: isinstance(v, int) and v > 0,
                "height": lambda v: isinstance(v, int) and v > 0,
            },
        )
        _check_interp_key(config)
