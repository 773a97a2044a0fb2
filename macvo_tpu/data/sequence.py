"""Sequence framework: registry datasets + clip / preload / transform / prefetch.

Behavioral parity with the reference sequence layer (DataLoader/SequenceBase.py:18-141):
datasets register by name, support index-mask clipping, threaded RAM preload and
composable frame transforms, and are instantiated from ``{type, args}`` config
nodes. TPU-first addition: :class:`DevicePrefetcher` overlaps host decode with
device compute by keeping N frames in flight on device (replaces torch
DataLoader workers — JAX dispatch is async, so one thread + device_put is enough).
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from types import SimpleNamespace
from typing import Any, Callable, Generator, Generic, TypeVar

import numpy as np

from ..utils.config import build_dynamic_config
from ..utils.logging import Logger
from ..utils.registry import RegisteredConfigTestable
from .frame import to_device

T_Data = TypeVar("T_Data")


class SequenceBase(RegisteredConfigTestable, Generic[T_Data], register=False):
    """Dataset base: implement ``__getitem__`` (local index -> frame) and call
    ``super().__init__(length)``."""

    def __init__(self, length: int) -> None:
        self.origin_length = length
        self.indices = np.arange(0, length, 1)

    def __getitem__(self, local_index: int) -> T_Data:
        raise NotImplementedError

    def get_index(self, local_index: int) -> int:
        return int(self.indices[local_index])

    def clip(self, start_idx: int | None = None, end_idx: int | None = None, step: int | None = None):
        self.indices = self.indices[start_idx:end_idx:step]
        return self

    def preload(self) -> "PreloadedSequence[T_Data]":
        return PreloadedSequence(self)

    def transform(self, actions):
        if isinstance(actions, list) and len(actions) == 0:
            return self
        return TransformSequence(self, actions)

    def __len__(self) -> int:
        return int(self.indices.size)

    def __iter__(self) -> Generator[T_Data, None, None]:
        for idx in range(len(self)):
            yield self[idx]

    def __repr__(self) -> str:
        return f"{self.name()}(orig_len={self.origin_length}, clip_len={len(self)})"

    @staticmethod
    def config_dict2ns(cfg: SimpleNamespace | dict[str, Any]) -> SimpleNamespace:
        if isinstance(cfg, SimpleNamespace):
            return cfg
        return build_dynamic_config(cfg)[0]

    @classmethod
    def from_config(cls, cfg: SimpleNamespace) -> "SequenceBase":
        """Build the sequence named by ``cfg.type`` with ``cfg.args``."""
        return cls.instantiate(cfg.type, cfg.args)


class PreloadedSequence(SequenceBase[T_Data], register=False):
    """RAM-cache the whole (clipped) sequence with a thread pool."""

    def __init__(self, seq: SequenceBase[T_Data]) -> None:
        Logger.info(f"Preloading {seq}")
        with ThreadPoolExecutor(max_workers=8) as pool:
            frames = list(pool.map(seq.__getitem__, range(len(seq))))
        self._frames = frames
        super().__init__(len(frames))

    def __getitem__(self, local_index: int) -> T_Data:
        return self._frames[self.get_index(local_index)]


class TransformSequence(SequenceBase[T_Data], register=False):
    def __init__(self, seq: SequenceBase[T_Data], actions) -> None:
        super().__init__(len(seq))
        self._seq = seq
        self._actions: list[Callable] = actions if isinstance(actions, list) else [actions]

    def __getitem__(self, local_index: int) -> T_Data:
        frame = self._seq[self.get_index(local_index)]
        for action in self._actions:
            frame = action(frame)
        return frame


class DevicePrefetcher(Generic[T_Data]):
    """Iterate a sequence with frames asynchronously staged onto the device.

    A background thread decodes+transforms frame t+1..t+depth while the device
    computes on frame t; ``device_put`` of numpy leaves overlaps with compute
    because JAX dispatch is async. Replaces the reference's ThreadPoolExecutor
    preloader (DataLoader/SequenceBase.py:78-95) for streaming use.
    """

    def __init__(self, seq: SequenceBase[T_Data], depth: int = 2, device=None) -> None:
        self.seq = seq
        self.depth = depth
        self.device = device

    def __len__(self) -> int:
        return len(self.seq)

    def __iter__(self) -> Generator[T_Data, None, None]:
        q: queue.Queue = queue.Queue(maxsize=self.depth)
        stop = object()

        def producer() -> None:
            try:
                for i in range(len(self.seq)):
                    q.put(to_device(self.seq[i], self.device))
            finally:
                q.put(stop)

        thread = threading.Thread(target=producer, daemon=True)
        thread.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        thread.join()


def smart_transform(seq: SequenceBase, trans_cfg) -> SequenceBase:
    """Select the transform list for this dataset type from a config mapping
    (reference: DataLoader/SequenceBase.py:120-141). ``trans_cfg`` is either a
    list of ``{type,args}`` nodes (applied directly) or a namespace keyed by
    dataset name."""
    from .transform import IDataTransform

    if isinstance(trans_cfg, dict):
        trans_cfg = build_dynamic_config(trans_cfg)[0]
    elif isinstance(trans_cfg, list):
        trans_cfg = [
            t if isinstance(t, SimpleNamespace) else build_dynamic_config(t)[0] for t in trans_cfg
        ]

    if isinstance(trans_cfg, list):
        transform_cfg = trans_cfg
    else:
        seq_type = seq.name()
        if not hasattr(trans_cfg, seq_type):
            return seq
        transform_cfg = getattr(trans_cfg, seq_type)

    actions = [IDataTransform.instantiate(t.type, t.args) for t in transform_cfg]
    if actions:
        Logger.info("Data transforms: " + ", ".join(type(a).__name__ for a in actions))
    return seq.transform(actions)
