"""Distributed bundle adjustment: observation-sharded two-frame solve.

The BASELINE north star (SURVEY.md §2.0 parallelism census, §7 M8): partition
the observation blocks of the LM problem across devices, accumulate each
device's Hessian/gradient contribution, and ``psum`` the 6x6 normal equations
over ICI — every device then runs the identical tiny LM update, so no
gather/broadcast of the solution is needed.

``solve_two_frame`` already supports an ``axis_name``; this module provides
the ``shard_map`` wrapper and the padding helper that rounds the observation
capacity up to a multiple of the mesh size.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..backend.solver import TwoFrameData, solve_two_frame

# Fields sharded along the observation axis; the rest replicate.
_OBS_FIELDS = {
    "points_w", "points_c", "kp2", "disp2", "cov_obs_c", "cov_pts_w",
    "cov_kp2", "disp2_cov", "mask",
}


def _specs() -> TwoFrameData:
    return TwoFrameData(**{
        f: P("obs") if f in _OBS_FIELDS else P()
        for f in TwoFrameData._fields
    })


def pad_to_multiple(data: TwoFrameData, multiple: int) -> TwoFrameData:
    """Pad the observation axis so it divides evenly across the mesh; padded
    rows are masked out (zero weight in the solve)."""
    n = data.mask.shape[0]
    pad = (-n) % multiple
    if pad == 0:
        return data

    def pad_field(name: str, arr):
        if name not in _OBS_FIELDS:
            return arr
        widths = [(0, pad)] + [(0, 0)] * (arr.ndim - 1)
        return jnp.pad(arr, widths)

    return TwoFrameData(**{
        f: pad_field(f, getattr(data, f)) for f in TwoFrameData._fields
    })


def make_sharded_solver(mesh: Mesh, graph_type: str = "icp"):
    """Returns ``solve(data) -> (7,) pose`` running the LM solve SPMD over the
    mesh's ``obs`` axis."""
    assert "obs" in mesh.axis_names, "mesh needs an 'obs' axis"
    n_shards = mesh.shape["obs"]

    inner = partial(solve_two_frame, graph_type=graph_type, axis_name="obs")
    sharded = shard_map(
        inner, mesh=mesh, in_specs=(_specs(),), out_specs=P(),
        check_rep=False,
    )
    sharded = jax.jit(sharded)

    def solve(data: TwoFrameData) -> jnp.ndarray:
        return sharded(pad_to_multiple(data, n_shards))

    return solve
