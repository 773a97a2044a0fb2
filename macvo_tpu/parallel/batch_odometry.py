"""Batched multi-sequence odometry: one sharded frontend forward for N sequences.

The pod-scaling path (SURVEY.md §2.0 P2 + §7 M8): MAC-VO's per-frame compute
is dominated by the frontend forward, and the forward has a natural batch
axis — the joint pair inference already batches 2 images per sequence
(Frontend.py:218-232). Here N sequences run in lockstep: their image pairs
stack into one (2N,H,W,3) batch sharded over the mesh's ``data`` axis, ONE
pjit forward serves all sequences, and each sequence's host-side map/backend
bookkeeping proceeds independently (the backend solves are tiny and async).

Throughput therefore scales with devices as long as N >= mesh size —
frames/s and seqs/s are reported by the harness below (BASELINE.json
measurement points: 1 chip / 1 host / N hosts).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.frame import StereoData
from ..modules.frontend import DepthOutput, IFrontend, MatchOutput
from ..modules.frontend_network import _FlowFormerRunner, _flow_to_match, _traced_flow_to_depth
from ..odometry import MACVO
from ..utils.logging import Logger


class _PrecomputedFrontend(IFrontend):
    """Frontend shim fed by the batched runner: returns the outputs staged for
    this sequence at the current step."""

    def __init__(self, config: SimpleNamespace | None = None) -> None:
        super().__init__(config or SimpleNamespace())
        self.staged: Optional[tuple[DepthOutput, MatchOutput]] = None
        self.staged_depth: Optional[DepthOutput] = None

    @property
    def provide_cov(self) -> tuple[bool, bool]:
        return True, True

    def estimate_depth(self, frame: StereoData) -> DepthOutput:
        assert self.staged_depth is not None
        return self.staged_depth

    def estimate_pair(self, frame_t1: StereoData, frame_t2: StereoData):
        assert self.staged is not None
        return self.staged

    @classmethod
    def is_valid_config(cls, config) -> None:
        return


class BatchedFrontend:
    """N-sequence FlowFormerCov forward, batch sharded over the 'data' axis."""

    def __init__(self, config: SimpleNamespace, mesh: Mesh) -> None:
        self.runner = _FlowFormerRunner(config)
        self.enforce_positive = bool(getattr(config, "enforce_positive_disparity", False))
        self.mesh = mesh
        self._jitted: dict = {}

    def _fn(self, shape):
        if shape not in self._jitted:
            batch_sharding = NamedSharding(self.mesh, P("data"))
            repl = NamedSharding(self.mesh, P())

            def fwd(img_a, img_b):
                return self.runner.forward_traced(img_a, img_b)

            self._jitted[shape] = jax.jit(
                fwd, in_shardings=(batch_sharding, batch_sharding),
                out_shardings=(repl, repl),
            )
        return self._jitted[shape]

    def forward_pairs(self, frames0: Sequence[StereoData], frames1: Sequence[StereoData]):
        """One sharded forward for all sequences' (stereo, temporal) pairs.
        Returns per-sequence (DepthOutput_t1, MatchOutput_01)."""
        img_a = jnp.concatenate(
            [f1.imageL for f1 in frames1] + [f0.imageL for f0 in frames0], axis=0
        )
        img_b = jnp.concatenate(
            [f1.imageR for f1 in frames1] + [f1.imageL for f1 in frames1], axis=0
        )
        flow, cov = self._fn(tuple(img_a.shape))(img_a, img_b)
        n = len(frames0)
        outs = []
        for i in range(n):
            depth = _traced_flow_to_depth(
                flow[i : i + 1], cov[i : i + 1],
                frames1[i].baseline[0], frames1[i].K[0, 0, 0], self.enforce_positive,
            )
            match = _flow_to_match(flow[n + i : n + i + 1], cov[n + i : n + i + 1])
            outs.append((depth, match))
        return outs

    def forward_depths(self, frames: Sequence[StereoData]):
        img_a = jnp.concatenate([f.imageL for f in frames], axis=0)
        img_b = jnp.concatenate([f.imageR for f in frames], axis=0)
        flow, cov = self._fn(tuple(img_a.shape))(img_a, img_b)
        return [
            _traced_flow_to_depth(
                flow[i : i + 1], cov[i : i + 1],
                frames[i].baseline[0], frames[i].K[0, 0, 0], self.enforce_positive,
            )
            for i in range(len(frames))
        ]


class BatchedOdometry:
    """Run N sequences in lockstep with a shared sharded frontend."""

    def __init__(self, cfg, n_sequences: int, mesh: Mesh) -> None:
        assert n_sequences % mesh.shape["data"] == 0 or n_sequences >= mesh.shape["data"], \
            "sequence count should cover the data axis"
        self.mesh = mesh
        self.frontend = BatchedFrontend(cfg.Odometry.frontend.args, mesh)
        self.systems: list[MACVO] = []
        self.shims: list[_PrecomputedFrontend] = []
        for _ in range(n_sequences):
            system = MACVO.from_config(_with_precomputed_frontend(cfg))
            shim = system.Frontend
            assert isinstance(shim, _PrecomputedFrontend)
            self.systems.append(system)
            self.shims.append(shim)

    def step(self, frames: Sequence) -> None:
        """Advance every sequence by one frame (frames[i] -> system i)."""
        fresh = [not s.is_initiated for s in self.systems]
        if any(fresh):
            depths = self.frontend.forward_depths([f.stereo for f in frames])
            for shim, d in zip(self.shims, depths):
                shim.staged_depth = d
        else:
            pairs = self.frontend.forward_pairs(
                [s.prev_keyframe[0].stereo for s in self.systems],
                [f.stereo for f in frames],
            )
            for shim, out in zip(self.shims, pairs):
                shim.staged = out
        for system, frame in zip(self.systems, frames):
            system.run(frame)

    def finish(self) -> None:
        """Flush every sequence's in-flight sync + backend solve."""
        for system in self.systems:
            system.terminate()

    def run(self, sequences: Sequence, max_frames: Optional[int] = None) -> None:
        n = min(len(s) for s in sequences)
        if max_frames is not None:
            n = min(n, max_frames)
        for i in range(n):
            self.step([seq[i] for seq in sequences])
        self.finish()


def _with_precomputed_frontend(cfg):
    """Clone the config with the frontend swapped for the shim type."""
    import copy

    cfg2 = copy.deepcopy(cfg)
    cfg2.Odometry.frontend = SimpleNamespace(type="_PrecomputedFrontend", args=SimpleNamespace())
    return cfg2
