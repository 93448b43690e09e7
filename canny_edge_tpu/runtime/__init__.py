"""Native (C++) runtime components, loaded via ctypes.

Provides :class:`FrameFeeder`, a producer-thread + ring-buffer frame source
(the datacenter replacement for the reference's blocking webcam loop,
src/main.cpp:78-115), and a native min-max normalizer for the ``-s`` stage
dumps.  The shared library is built on demand with ``make``; if no C++
toolchain is available, ``available()`` returns False and callers fall back
to the pure-Python frame sources in canny_edge_tpu.io.video.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_DIR, "libcanny_feeder.so")
_lib = None
_lock = threading.Lock()

MODE_SYNTHETIC = 0
MODE_RAW8 = 1
MODE_PGM_DIR = 2


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        if not os.path.exists(_SO):
            try:
                subprocess.run(["make", "-C", _DIR, "-s"], check=True,
                               capture_output=True)
            except Exception:
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.feeder_create.restype = ctypes.c_void_p
        lib.feeder_create.argtypes = [
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_uint64]
        lib.feeder_acquire.restype = ctypes.c_int64
        lib.feeder_acquire.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.c_int]
        lib.feeder_release.argtypes = [ctypes.c_void_p]
        lib.feeder_stats.argtypes = [ctypes.c_void_p] + [
            ctypes.POINTER(ctypes.c_uint64)] * 5
        lib.feeder_destroy.argtypes = [ctypes.c_void_p]
        lib.minmax_normalize_u8.argtypes = [
            ctypes.POINTER(ctypes.c_int16), ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


class FrameFeeder:
    """Background-thread frame producer with a zero-copy ring buffer.

    Example::

        with FrameFeeder(1080, 1920, count=1000) as feeder:
            for frame in feeder:          # np.uint8 (H, W) views
                edges = model(frame, 50, 150)
    """

    def __init__(self, h: int, w: int, *, capacity: int = 8,
                 mode: int = MODE_SYNTHETIC, path: str = "",
                 count: int = 0, seed: int = 0):
        lib = _load()
        if lib is None:
            raise RuntimeError("native feeder library unavailable")
        self._lib = lib
        self.h, self.w = h, w
        self._handle = lib.feeder_create(
            h, w, capacity, mode, path.encode(), count, seed)
        if not self._handle:
            raise RuntimeError("feeder_create failed (bad args or source)")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()

    def __iter__(self) -> Iterator[np.ndarray]:
        while True:
            frame = self.next(timeout_ms=-1)
            if frame is None:
                return
            yield frame

    def next(self, timeout_ms: int = -1):
        """Acquire the next frame as a zero-copy view; returns None at end
        of stream.  The view is valid until the next call (the slot is
        released on the following acquire) — copy it if you need it longer.
        """
        self._lib.feeder_release(self._handle)  # release previous slot
        ptr = ctypes.POINTER(ctypes.c_uint8)()
        idx = self._lib.feeder_acquire(self._handle, ctypes.byref(ptr),
                                       timeout_ms)
        if idx == -1:
            return None
        if idx == -2:
            raise TimeoutError("feeder_acquire timed out")
        arr = np.ctypeslib.as_array(ptr, shape=(self.h, self.w))
        return arr

    def stats(self) -> dict:
        vals = [ctypes.c_uint64() for _ in range(5)]
        self._lib.feeder_stats(self._handle, *[ctypes.byref(v) for v in vals])
        keys = ("produced", "consumed", "producer_waits", "consumer_waits",
                "read_errors")
        return dict(zip(keys, (v.value for v in vals)))

    def close(self):
        if getattr(self, "_handle", None):
            self._lib.feeder_destroy(self._handle)
            self._handle = None


def minmax_normalize_u8_native(img: np.ndarray) -> np.ndarray:
    """Native min-max normalize (bit-identical to io.imageio version)."""
    lib = _load()
    if lib is None:
        from ..io.imageio import minmax_normalize_u8

        return minmax_normalize_u8(img)
    src = np.ascontiguousarray(img, np.int16)
    dst = np.empty(src.shape, np.uint8)
    lib.minmax_normalize_u8(
        src.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
        dst.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        src.size)
    return dst
