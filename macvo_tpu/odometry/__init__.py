"""Odometry runtime (reference: Odometry/)."""

from .interface import IOdometry
from .macvo import MACVO

__all__ = ["IOdometry", "MACVO"]
