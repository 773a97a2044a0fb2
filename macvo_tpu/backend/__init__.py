"""Backend optimization (reference: Module/Optimization/)."""

from .interface import IOptimizer
from .solver import TwoFrameData, solve_two_frame
from .two_frame_pgo import (
    Empty_TwoFrame_PGO,
    GraphInput,
    GraphOutput,
    Local_TwoFrame_PGO,
    TwoFrame_PGO,
)

__all__ = [
    "IOptimizer", "TwoFrameData", "solve_two_frame",
    "TwoFrame_PGO", "Local_TwoFrame_PGO", "Empty_TwoFrame_PGO",
    "GraphInput", "GraphOutput",
]
