"""ctypes bindings for the native host runtime (ring + FIFO reader).

Builds ``libglava_ring.so`` on first use if the toolchain is available;
callers fall back to the pure-Python ring when it isn't (the compute
path is unaffected — this is host-capture infrastructure).
"""

from __future__ import annotations

import ctypes
import subprocess
import threading
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent
_SO = _DIR / "libglava_ring.so"
_lock = threading.Lock()
_lib = None
_build_error: str | None = None


def _load():
    global _lib, _build_error
    with _lock:
        if _lib is not None or _build_error is not None:
            return _lib
        if not _SO.exists():
            try:
                subprocess.run(
                    ["make", "-s", "-C", str(_DIR)],
                    check=True, capture_output=True, text=True, timeout=120,
                )
            except (subprocess.CalledProcessError, FileNotFoundError,
                    subprocess.TimeoutExpired) as e:
                _build_error = getattr(e, "stderr", str(e)) or str(e)
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError as e:
            _build_error = str(e)
            return None
        lib.gt_ring_new.restype = ctypes.c_void_p
        lib.gt_ring_new.argtypes = [ctypes.c_size_t]
        lib.gt_ring_free.argtypes = [ctypes.c_void_p]
        lib.gt_ring_push.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float), ctypes.c_size_t,
        ]
        lib.gt_ring_push_mono.argtypes = lib.gt_ring_push.argtypes
        lib.gt_ring_snapshot.restype = ctypes.c_uint64
        lib.gt_ring_snapshot.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_float),
            ctypes.POINTER(ctypes.c_float),
        ]
        lib.gt_ring_updates.restype = ctypes.c_uint64
        lib.gt_ring_updates.argtypes = [ctypes.c_void_p]
        lib.gt_fifo_start.restype = ctypes.c_void_p
        lib.gt_fifo_start.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t,
            ctypes.c_int, ctypes.c_float,
        ]
        lib.gt_fifo_running.restype = ctypes.c_int
        lib.gt_fifo_running.argtypes = [ctypes.c_void_p]
        lib.gt_fifo_stop.argtypes = [ctypes.c_void_p]
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.gt_rgba_to_yuv444.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_size_t, u8p, u8p, u8p,
        ]
        lib.gt_png_unfilter.restype = ctypes.c_int
        lib.gt_png_unfilter.argtypes = [
            u8p, ctypes.c_size_t, ctypes.c_size_t, ctypes.c_size_t, u8p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _build_error


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


class NativeRing:
    """Seqlock stereo history ring (see ring.cpp)."""

    def __init__(self, bufsize: int):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native ring unavailable: {_build_error}")
        self._lib = lib
        self.bufsize = bufsize
        self._h = ctypes.c_void_p(lib.gt_ring_new(bufsize))
        self._snap = np.zeros((2, bufsize), np.float32)
        self._last_updates = 0

    def push(self, left: np.ndarray, right: np.ndarray, mono: bool = False) -> None:
        left = np.ascontiguousarray(left, np.float32)
        right = np.ascontiguousarray(right, np.float32)
        fn = self._lib.gt_ring_push_mono if mono else self._lib.gt_ring_push
        fn(self._h, _fptr(left), _fptr(right), len(left))

    def snapshot(self) -> tuple[np.ndarray, bool]:
        """(buffer copy, modified since last snapshot)."""
        upd = self._lib.gt_ring_snapshot(
            self._h, _fptr(self._snap[0]), _fptr(self._snap[1])
        )
        modified = upd != self._last_updates
        self._last_updates = upd
        return self._snap.copy(), modified

    @property
    def updates(self) -> int:
        return int(self._lib.gt_ring_updates(self._h))

    def close(self) -> None:
        if self._h:
            self._lib.gt_ring_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


def rgba_to_yuv444(frame: np.ndarray) -> tuple[np.ndarray, ...] | None:
    """Native RGBA8 (bottom-up) -> planar YUV444 (top-down) for the y4m
    sink; None when the native lib is unavailable."""
    lib = _load()
    if lib is None:
        return None
    h, w = frame.shape[:2]
    frame = np.ascontiguousarray(frame, np.uint8)
    y = np.empty((h, w), np.uint8)
    u = np.empty((h, w), np.uint8)
    v = np.empty((h, w), np.uint8)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    lib.gt_rgba_to_yuv444(p(frame), w, h, p(y), p(u), p(v))
    return y, u, v


class NativeFifoReader:
    """Native capture thread reading s16le stereo from a FIFO."""

    def __init__(self, ring: NativeRing, path: str, hop: int,
                 mono: bool = False, scale: float = 1.0 / 65535.0):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"native ring unavailable: {_build_error}")
        self._lib = lib
        self._ring = ring  # keep the ring alive while the thread runs
        self._h = ctypes.c_void_p(
            lib.gt_fifo_start(ring._h, path.encode(), hop, int(mono),
                              ctypes.c_float(scale))
        )
        if not self._h:
            raise RuntimeError("failed to start native FIFO reader")

    def running(self) -> int:
        return self._lib.gt_fifo_running(self._h)

    def stop(self) -> None:
        if self._h:
            self._lib.gt_fifo_stop(self._h)
            self._h = None
            self._ring = None

    def __del__(self):
        try:
            self.stop()
        except Exception:
            pass


def png_unfilter(raw: bytes, h: int, stride: int,
                 nchan: int) -> np.ndarray | None:
    """Native PNG scanline unfiltering (RFC 2083 filters 0-4); None
    when the native lib is unavailable. Returns (h, stride) uint8."""
    lib = _load()
    if lib is None:
        return None
    src = np.frombuffer(raw, np.uint8, h * (stride + 1))
    src = np.ascontiguousarray(src)
    out = np.empty((h, stride), np.uint8)

    def p(a):
        return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    rc = lib.gt_png_unfilter(p(src), h, stride, nchan, p(out))
    if rc != 0:
        raise ValueError(f"unknown PNG filter {rc}")
    return out
