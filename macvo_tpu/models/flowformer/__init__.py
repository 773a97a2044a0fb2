"""FlowFormerCov network family (reference: Module/Network/FlowFormerCov/ +
the reconstructed FlowFormer core, SURVEY.md §2.9)."""

from .decoder import (
    MemoryCovDecoder,
    bilinear_sample,
    coords_grid,
    encode_flow_token,
    upsample_convex,
)
from .encoder import MemoryEncoder, all_pairs_correlation
from .network import FlowFormerConfig, FlowFormerCov, InputPadder, make_inference_fn, normalize_cov
from .twins import TwinsSVT

__all__ = [
    "FlowFormerConfig", "FlowFormerCov", "InputPadder", "MemoryCovDecoder",
    "MemoryEncoder", "TwinsSVT", "all_pairs_correlation", "bilinear_sample",
    "coords_grid", "encode_flow_token", "make_inference_fn", "normalize_cov",
    "upsample_convex",
]
