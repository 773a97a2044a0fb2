"""Jitted compute primitives (selection, covariance projection, kernels)."""

from . import cov_project, select

__all__ = ["cov_project", "select"]
