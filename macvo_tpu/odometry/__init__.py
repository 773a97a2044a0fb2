"""Odometry runtime (reference: Odometry/)."""

from .interface import IOdometry
from .macvo import MACVO
from .baseline_tartanvo import TartanVO

__all__ = ["IOdometry", "MACVO", "TartanVO"]
