"""TartanVO network family (reference: Module/Network/{TartanVOStereo,StereoCov,PWCNet})."""

from .network import (
    FLOW_NORM,
    POSE_DEPTH_NORM,
    POSE_NORM,
    POSENET_SIZE,
    STEREO_NORM,
    StereoVONet,
    crop_to_multiple,
    make_intrinsics_layer,
    normalize_image,
    resize_bilinear,
)
from .posenet import VOFlowRes
from .pwc import PWCFlowNet, warp_features
from .raftcov import GaussianGRU, RAFTFlowCovNet
from .stereonet import HourglassDecoder, StereoCovNet

__all__ = [
    "FLOW_NORM", "POSE_DEPTH_NORM", "POSE_NORM", "POSENET_SIZE", "STEREO_NORM",
    "GaussianGRU", "HourglassDecoder", "PWCFlowNet", "RAFTFlowCovNet",
    "StereoCovNet", "StereoVONet", "VOFlowRes", "crop_to_multiple",
    "make_intrinsics_layer", "normalize_image", "resize_bilinear", "warp_features",
]
