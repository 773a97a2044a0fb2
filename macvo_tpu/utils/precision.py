"""Matmul-precision control for the geometry/solver path.

On TPU an f32-typed matmul/einsum runs reduced-precision MXU passes unless
HIGHEST is requested — measured as the dominant part of a 4.7x E2E ATE gap
vs CPU on identical weights (evidence/tpu_cpu_gap_r5.json; the reference
manages the same knob class on GPU via TF32 toggles,
Module/Frontend/Frontend.py:275-278).

The NETWORK chooses precision by dtype policy (fp32 config = accuracy mode =
HIGHEST; bf16 = speed mode — modules/frontend_network.py). The GEOMETRY path
(keypoint pipeline, covariance projection, LM solver) is a few thousand tiny
3x3/6x6 contractions per frame — microseconds of MXU time — so it always
runs HIGHEST: accuracy is free there.
"""

from __future__ import annotations

from functools import wraps

import jax


def matmul_highest(fn):
    """Trace ``fn`` under matmul precision HIGHEST (wrap BEFORE jax.jit so
    the context is active at trace time)."""

    @wraps(fn)
    def wrapped(*args, **kwargs):
        with jax.default_matmul_precision("highest"):
            return fn(*args, **kwargs)

    return wrapped
