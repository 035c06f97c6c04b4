"""ctypes loader for the reference-DSP differential oracle.

``librefdsp.so`` is the reference's own transform chain
(glava/render.c:660-848) extracted and compiled at build time by
``glava_tpu/native/Makefile`` (target ``refdsp``); see
``glava_tpu/native/refdsp_shim.c``.  Tests that import this module
drive randomized sequences through REAL reference code — when the
reference tree or toolchain is absent, ``available()`` is False and
the differential tests skip (the transcription oracles in
``tests/oracles.py`` still run everywhere).
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path

import numpy as np

_DIR = Path(__file__).resolve().parent.parent / "glava_tpu" / "native"
_SO = _DIR / "librefdsp.so"
_REF = Path("/root/reference/glava/render.c")
_lib = None
_error: str | None = None


def _load():
    global _lib, _error
    if _lib is not None or _error is not None:
        return _lib
    if not _REF.exists():
        _error = f"reference source not present: {_REF}"
        return None
    try:
        subprocess.run(
            ["make", "-s", "-C", str(_DIR), "refdsp"],
            check=True, capture_output=True, text=True, timeout=120,
        )
    except (subprocess.CalledProcessError, FileNotFoundError,
            subprocess.TimeoutExpired) as e:
        _error = getattr(e, "stderr", str(e)) or str(e)
        return None
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError as e:
        _error = str(e)
        return None
    fp = ctypes.POINTER(ctypes.c_float)
    lib.refdsp_new.restype = ctypes.c_void_p
    lib.refdsp_new.argtypes = [
        ctypes.c_size_t, ctypes.c_int, ctypes.c_float, ctypes.c_float,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
    ]
    lib.refdsp_free.argtypes = [ctypes.c_void_p]
    lib.refdsp_set_ur.argtypes = [ctypes.c_void_p, ctypes.c_float]
    for name in ("fft", "gravity", "average", "smooth", "wrange", "update"):
        fn = getattr(lib, f"refdsp_{name}")
        fn.argtypes = [ctypes.c_void_p, fp, ctypes.c_size_t]
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def build_error() -> str | None:
    _load()
    return _error


class RefDSP:
    """One reference transform-chain instance (own scratch state)."""

    def __init__(self, *, avg_frames: int = 6, avg_window: bool = True,
                 gravity_step: float = 4.2, ur: float = 86.1,
                 smooth_distance: float = 0.01, smooth_ratio: float = 4.0,
                 fft_scale: float = 10.2, fft_cutoff: float = 0.3):
        lib = _load()
        if lib is None:
            raise RuntimeError(f"refdsp unavailable: {_error}")
        self._lib = lib
        self._h = ctypes.c_void_p(lib.refdsp_new(
            avg_frames, int(avg_window), gravity_step, ur,
            smooth_distance, smooth_ratio, fft_scale, fft_cutoff,
        ))

    def set_ur(self, ur: float) -> None:
        self._lib.refdsp_set_ur(self._h, ctypes.c_float(ur))

    def _apply(self, name: str, buf: np.ndarray) -> np.ndarray:
        out = np.ascontiguousarray(buf, np.float32).copy()
        fn = getattr(self._lib, f"refdsp_{name}")
        fn(self._h, out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
           out.size)
        return out

    def fft(self, buf):
        return self._apply("fft", buf)

    def gravity(self, buf):
        return self._apply("gravity", buf)

    def average(self, buf):
        return self._apply("average", buf)

    def smooth(self, buf):
        return self._apply("smooth", buf)

    def wrange(self, buf):
        return self._apply("wrange", buf)

    def update(self, buf):
        """Full CPU-path audio update: fft -> gravity -> average."""
        return self._apply("update", buf)

    def close(self):
        if self._h:
            self._lib.refdsp_free(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
