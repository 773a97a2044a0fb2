"""Native (C++) runtime components, consumed via ctypes.

Currently: the threaded PNG decode engine (loader.cpp) that backs fast
sequence preload/prefetch. Compiled on first use with g++ (libpng is a
system dependency of this image); falls back transparently to the cv2 path
when a toolchain is unavailable, so the Python package never hard-requires
the extension.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional, Sequence

import numpy as np

from ..utils.logging import Logger

_SRC = Path(__file__).parent / "loader.cpp"
_SO = Path(__file__).parent / "build" / "libmvo_loader.so"
_LIB: Optional[ctypes.CDLL] = None
_BUILD_FAILED = False


def _build() -> bool:
    _SO.parent.mkdir(exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        str(_SRC), "-o", str(_SO), "-lpng", "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        return True
    except (subprocess.CalledProcessError, subprocess.TimeoutExpired, FileNotFoundError) as exc:
        detail = getattr(exc, "stderr", b"")
        Logger.warning(f"native loader build failed ({exc}); {detail!r}; using cv2 fallback")
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library; None if unavailable."""
    global _LIB, _BUILD_FAILED
    if _LIB is not None:
        return _LIB
    if _BUILD_FAILED:
        return None
    if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            _BUILD_FAILED = True
            return None
    lib = ctypes.CDLL(str(_SO))
    lib.mvo_decode_png.restype = ctypes.c_int
    lib.mvo_decode_png.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.mvo_pool_create.restype = ctypes.c_void_p
    lib.mvo_pool_create.argtypes = [ctypes.c_int]
    lib.mvo_pool_destroy.argtypes = [ctypes.c_void_p]
    lib.mvo_pool_decode_batch.restype = ctypes.c_int
    lib.mvo_pool_decode_batch.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.c_int, ctypes.c_int,
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return get_lib() is not None


def decode_png(path: str | Path, max_h: int = 4096, max_w: int = 4096) -> Optional[np.ndarray]:
    """Decode one PNG -> (H,W,3) float32 RGB in [0,1]; None if native path
    unavailable or decode failed."""
    lib = get_lib()
    if lib is None:
        return None
    buf = np.empty((max_h, max_w, 3), dtype=np.float32)
    h = ctypes.c_int()
    w = ctypes.c_int()
    rc = lib.mvo_decode_png(
        str(path).encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        max_h, max_w, ctypes.byref(h), ctypes.byref(w),
    )
    if rc != 0:
        return None
    # The decoder writes rows tightly packed at the true width.
    return buf.reshape(-1)[: h.value * w.value * 3].reshape(h.value, w.value, 3).copy()


class NativeDecodePool:
    """Threaded batch decoder: paths -> (N,H,W,3) float32, GIL-free."""

    def __init__(self, n_threads: int = 0) -> None:
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native loader unavailable")
        self._lib = lib
        self._pool = lib.mvo_pool_create(n_threads)

    def decode_batch(self, paths: Sequence[str | Path], height: int, width: int) -> np.ndarray:
        n = len(paths)
        out = np.empty((n, height, width, 3), dtype=np.float32)
        c_paths = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
        failures = self._lib.mvo_pool_decode_batch(
            self._pool, c_paths, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), height, width,
        )
        if failures:
            raise IOError(f"native decode: {failures}/{n} images failed")
        return out

    def close(self) -> None:
        if self._pool is not None:
            self._lib.mvo_pool_destroy(self._pool)
            self._pool = None

    def __del__(self) -> None:  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
