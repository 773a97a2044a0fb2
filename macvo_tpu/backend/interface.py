"""Backend optimizer interface (reference: Module/Optimization/Interface.py:40-264).

The reference hides backend latency behind a spawned child process and a
duplex pipe; frame t's optimization overlaps frame t+1's frontend. On TPU the
same one-frame-latency pipelining falls out of XLA's async dispatch: the
jitted solve is *dispatched* in ``start_optimize`` (returns immediately with
a future-backed device array) and only materialized in ``write_map`` one
frame later — no process, no pickling, no clone-on-receive.

The ``parallel`` config key is accepted for config parity and ignored
(async dispatch is always on).
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Any, Generic, Optional, TypeVar

from ..utils.registry import RegisteredConfigTestable
from ..worldmap import VisualMap

T_GraphInput = TypeVar("T_GraphInput")
T_GraphOutput = TypeVar("T_GraphOutput")


class IOptimizer(RegisteredConfigTestable, Generic[T_GraphInput, T_GraphOutput], register=False):
    #: True when the subclass can consume the odometry pipeline's packed sync
    #: array device-side (zero host round trips) via ``start_optimize_device``.
    supports_device_chaining = False

    def __init__(self, config: SimpleNamespace) -> None:
        self.config = config
        self.context: Any = self.init_context(config)
        self._pending: Optional[T_GraphOutput] = None

    # -- subclass hooks -------------------------------------------------------
    @staticmethod
    def init_context(config: SimpleNamespace) -> Any:
        return {}

    def get_graph_data(self, global_map: VisualMap, frame_idx: int) -> T_GraphInput:
        raise NotImplementedError

    def _optimize(self, context: Any, graph_data: T_GraphInput) -> tuple[Any, T_GraphOutput]:
        """Dispatch the (jitted) solve. MUST NOT block on the device result."""
        raise NotImplementedError

    def write_graph_data(self, result: Optional[T_GraphOutput], global_map: VisualMap) -> None:
        raise NotImplementedError

    # -- driver protocol (reference: Interface.py:139-241) --------------------
    def start_optimize(self, graph_data: T_GraphInput) -> None:
        assert self._pending is None, "start_optimize called while a job is still pending"
        self.context, self._pending = self._optimize(self.context, graph_data)

    @property
    def is_running(self) -> bool:
        return self._pending is not None

    def write_map(self, global_map: VisualMap) -> None:
        """Consume the pending result (blocks on the device here) and write the
        optimized pose back into the map."""
        if self._pending is None:
            return
        result, self._pending = self._pending, None
        self.write_graph_data(result, global_map)

    def take_pending(self) -> Optional[T_GraphOutput]:
        """Hand the pending result to the caller WITHOUT materializing it —
        the orchestrator's fused pipeline consumes the optimized pose
        device-side and updates the host map from its single packed sync
        (zero extra link round-trips). Clears the pending slot."""
        result, self._pending = self._pending, None
        return result

    def terminate(self) -> None:
        self._pending = None
