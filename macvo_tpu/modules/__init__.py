"""Pluggable pipeline modules (reference: Module/__init__.py:1-11 re-exports)."""

from .covariance import (
    DepthCovariance,
    GaussianMixtureCovariance,
    ICovariance2to3,
    MatchCovariance,
    Modifier_Diagonalize,
    Modifier_Normalize,
    NoCovariance,
)
from .frontend import (
    ApplyGTDepthCov,
    ApplyGTMatchCov,
    ApplyGTMatchMask,
    DepthOutput,
    FrontendCompose,
    GTDepth,
    GTMatcher,
    IFrontend,
    IMatcher,
    IStereoDepth,
    MatchOutput,
    retrieve_pixels,
)
from .frontend_network import (
    FlowFormerCovDepth,
    FlowFormerCovFrontend,
    FlowFormerCovMatcher,
    FlowFormerDepth,
    FlowFormerMatcher,
)
from .frontend_tartanvo import (
    TartanMotionNet,
    TartanVOCovMatcher,
    TartanVODepth,
    TartanVOMatcher,
)
from .keyframe import AllKeyframe, IKeyframeSelector, UniformKeyframe
from .keypoint import (
    CovAwareSelector,
    CovAwareSelector_NoDepth,
    GradientSelector,
    GridSelector,
    IKeypointSelector,
    MappingPointSelector,
    RandomSelector,
    SelectorCompose,
    SparseGradienSelector,
    SparseGradientSelector,
)
from .map_processor import IMapProcessor, MotionInterpolate, PoseInterpolate
from .motion import GTMotionwithNoise, IMotionModel, ReadPoseFile, StaticMotionModel
from .outlier import (
    CovarianceSanityFilter,
    FilterCompose,
    IdentityFilter,
    IObservationFilter,
    LikelyFrontOfCamFilter,
    SimpleDepthFilter,
)

__all__ = [
    "ICovariance2to3", "IFrontend", "IMatcher", "IStereoDepth", "IKeyframeSelector",
    "IKeypointSelector", "IMapProcessor", "IMotionModel", "IObservationFilter",
    "DepthOutput", "MatchOutput", "retrieve_pixels",
    "NoCovariance", "DepthCovariance", "MatchCovariance", "GaussianMixtureCovariance",
    "Modifier_Diagonalize", "Modifier_Normalize",
    "GTDepth", "GTMatcher", "ApplyGTDepthCov", "ApplyGTMatchCov", "ApplyGTMatchMask",
    "FrontendCompose", "FlowFormerCovFrontend", "FlowFormerCovMatcher",
    "FlowFormerMatcher", "FlowFormerDepth", "FlowFormerCovDepth",
    "AllKeyframe", "UniformKeyframe",
    "RandomSelector", "GridSelector", "GradientSelector", "SparseGradientSelector",
    "SparseGradienSelector", "CovAwareSelector", "CovAwareSelector_NoDepth",
    "MappingPointSelector", "SelectorCompose",
    "PoseInterpolate", "MotionInterpolate",
    "StaticMotionModel", "GTMotionwithNoise", "ReadPoseFile", "TartanMotionNet",
    "TartanVOMatcher", "TartanVOCovMatcher", "TartanVODepth",
    "IdentityFilter", "FilterCompose", "CovarianceSanityFilter", "SimpleDepthFilter",
    "LikelyFrontOfCamFilter",
]
