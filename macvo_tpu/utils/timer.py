"""Opt-in profiler: host wall-clock + device timing via ``block_until_ready``.

TPU-native replacement for the reference's dual CPU-wall / CUDA-event timer
(Utility/Timer.py:13-163). CUDA events have no TPU analogue; device-side
sections are timed by synchronizing on the produced arrays (XLA dispatch is
async, so a plain wall clock would only measure enqueue time). For deep traces
use ``jax.profiler.trace`` via :func:`trace`.
"""

from __future__ import annotations

import contextlib
import functools
import json
import statistics
import time
from pathlib import Path
from typing import Any, Callable, Iterator

import jax


class _TimerState:
    def __init__(self) -> None:
        self.active = False
        self.records: dict[str, list[float]] = {}

    def add(self, name: str, elapsed_ms: float) -> None:
        self.records.setdefault(name, []).append(elapsed_ms)


_STATE = _TimerState()


def setup(active: bool) -> None:
    _STATE.active = active


def is_active() -> bool:
    return _STATE.active


@contextlib.contextmanager
def cpu_time(name: str) -> Iterator[None]:
    if not _STATE.active:
        yield
        return
    t0 = time.perf_counter()
    try:
        yield
    finally:
        _STATE.add(name, (time.perf_counter() - t0) * 1e3)


@contextlib.contextmanager
def device_time(name: str, *sync_on: Any) -> Iterator[list]:
    """Times a device section; caller appends output arrays to the yielded list
    (or passes them up-front) and we block on them before stopping the clock."""
    if not _STATE.active:
        yield list(sync_on)
        return
    outputs: list = list(sync_on)
    t0 = time.perf_counter()
    try:
        yield outputs
    finally:
        for out in outputs:
            jax.block_until_ready(out)
        _STATE.add(name, (time.perf_counter() - t0) * 1e3)


def cpu_timeit(name: str) -> Callable:
    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapped(*args: Any, **kwargs: Any) -> Any:
            with cpu_time(name):
                return fn(*args, **kwargs)

        return wrapped

    return deco


def device_timeit(name: str) -> Callable:
    """Decorator timing a function that returns jax arrays (pytree ok)."""

    def deco(fn: Callable) -> Callable:
        @functools.wraps(fn)
        def wrapped(*args: Any, **kwargs: Any) -> Any:
            if not _STATE.active:
                return fn(*args, **kwargs)
            t0 = time.perf_counter()
            out = fn(*args, **kwargs)
            jax.block_until_ready(out)
            _STATE.add(name, (time.perf_counter() - t0) * 1e3)
            return out

        return wrapped

    return deco


@contextlib.contextmanager
def trace(logdir: str | Path) -> Iterator[None]:
    with jax.profiler.trace(str(logdir)):
        yield


def report() -> str:
    lines = [f"{'section':<28}{'calls':>8}{'avg ms':>12}{'median ms':>12}{'total ms':>12}"]
    for name, vals in sorted(_STATE.records.items()):
        lines.append(
            f"{name:<28}{len(vals):>8}{sum(vals) / len(vals):>12.3f}"
            f"{statistics.median(vals):>12.3f}{sum(vals):>12.1f}"
        )
    text = "\n".join(lines)
    print(text)
    return text


def save_elapsed(path: str | Path) -> None:
    with open(path, "w") as f:
        json.dump(_STATE.records, f)


def reset() -> None:
    _STATE.records.clear()
