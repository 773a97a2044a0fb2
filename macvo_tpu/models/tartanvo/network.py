"""StereoVONet assembly + MAC-VO adapters (flax).

Capability-equivalent rebuild of the reference TartanVO stereo stack
(Module/Network/TartanVOStereo/StereoVO.py:6-54 — PWC flow net + hourglass
stereo net + VOFlowRes pose head) and its MAC-VO adapter conventions
(StereoVO_Interface.py:15-194): images crop to /64 multiples, intrinsics
layer at the network scale, ``flow_norm = 0.05``, ``stereoNormFactor = 0.02``,
``poseDepthNormFactor = 0.25``, and the se3 output scaled by
``pose_norm = [0.13]*3 + [0.013]*3``.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .posenet import VOFlowRes
from .pwc import PWCFlowNet
from .stereonet import StereoCovNet

POSE_NORM = np.array([0.13, 0.13, 0.13, 0.013, 0.013, 0.013], dtype=np.float32)
FLOW_NORM = 0.05
STEREO_NORM = 0.02
POSE_DEPTH_NORM = 0.25
POSENET_SIZE = (112, 160)   # PoseNet input size (TartanVO paper)

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], dtype=np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], dtype=np.float32)


def normalize_image(img: jnp.ndarray) -> jnp.ndarray:
    return (img - IMAGENET_MEAN) / IMAGENET_STD


def crop_to_multiple(img: jnp.ndarray, factor: int = 64) -> jnp.ndarray:
    """Center-crop H,W down to multiples of ``factor``
    (reference: StereoVO_Interface.py:116-123)."""
    h, w = img.shape[1], img.shape[2]
    h64, w64 = (h // factor) * factor, (w // factor) * factor
    mh, mw = (h - h64) // 2, (w - w64) // 2
    return img[:, mh : mh + h64, mw : mw + w64]


def make_intrinsics_layer(
    height: int, width: int, fx: float, fy: float, cx: float, cy: float
) -> jnp.ndarray:
    """(H,W,2) normalized pixel-offset layer fed to the pose net
    (reference: TartanVOStereo/Utility.py make_intrinsics_layer)."""
    xs = (jnp.arange(width, dtype=jnp.float32) - cx) / fx
    ys = (jnp.arange(height, dtype=jnp.float32) - cy) / fy
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([gx, gy], axis=-1)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """(B,H,W,C) -> (B,h,w,C) bilinear resize."""
    return jax.image.resize(x, (x.shape[0], size[0], size[1], x.shape[3]), "bilinear")


class StereoVONet(nn.Module):
    """Composite net: flow + stereo disparity (+cov) + pose.

    Sub-networks are callable independently (``method`` selects the path) so
    each MAC-VO module jits only what it needs, matching the reference's
    forward_flow / forward_stereo / flowPoseNet entry points.
    """

    @nn.compact
    def __call__(self, img1, img2, method: str = "flow"):
        if method == "flow":
            return PWCFlowNet(name="flow_net")(img1, img2)
        if method == "stereo":
            return StereoCovNet(name="stereo_net")(img1, img2)
        if method == "pose":
            # img1 here is the (B,112,160,5) motion stack; img2 unused.
            return VOFlowRes(name="pose_net")(img1)
        raise ValueError(f"unknown method {method!r}")
