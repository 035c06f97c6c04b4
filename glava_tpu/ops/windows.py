"""Window / weighting curves shared across the DSP and raster stages.

Numerically matches the macro definitions the reference exposes to both
its C transforms and its GLSL shaders (reference:
glava/render.c:660-661 and shaders/glava/util/common.glsl:12-21).
These are host-side (numpy) helpers: windows are static per
configuration, so they are baked into the jitted pipeline as constants
rather than recomputed on device.
"""

from __future__ import annotations

import numpy as np

TWOPI = 6.28318530718
PI = 3.14159265359


def window(t, sz):
    """Hamming-like curve, ``0.53836 - 0.46164*cos(2*pi*t/sz)``.

    The reference uses this both to window PCM before the FFT
    (render.c:660, applied at render.c:793 with ``sz = buf_len - 1``)
    and as the frame-averaging weight on the GPU path
    (shaders/glava/util/average_pass.frag).
    """
    t = np.asarray(t, dtype=np.float64)
    return 0.53836 - 0.46164 * np.cos(TWOPI * t / sz)


def window_frame(t, sz):
    """0.6/0.4 cosine curve (render.c:661) — CPU-path averaging weight."""
    t = np.asarray(t, dtype=np.float64)
    return 0.6 - 0.4 * np.cos(TWOPI * t / sz)


def window_shallow(t, sz):
    """0.7/0.3 cosine curve (util/common.glsl:15) — 3-frame GPU averaging."""
    t = np.asarray(t, dtype=np.float64)
    return 0.7 - 0.3 * np.cos(TWOPI * t / sz)


def pcm_window(n: int) -> np.ndarray:
    """The window applied to an ``n``-sample PCM buffer before the FFT.

    Matches the reference loop ``data[i] *= window(i, sz - 1)``
    (render.c:792-795): full buffer length, denominator ``n - 1``.
    """
    i = np.arange(n, dtype=np.float64)
    return window(i, n - 1).astype(np.float32)


def linear(x):
    """Identity weighting curve (util/common.glsl:17)."""
    return np.asarray(x, dtype=np.float64)


def sinusoidal(x):
    """Sine-eased weighting curve (util/common.glsl:19)."""
    x = np.asarray(x, dtype=np.float64)
    return (0.5 * np.sin((PI * x) - (PI / 2))) + 0.5


def circular(x):
    """Circular-arc weighting curve (util/common.glsl:21)."""
    x = np.asarray(x, dtype=np.float64)
    return np.sqrt(np.maximum(1.0 - ((x - 1.0) * (x - 1.0)), 0.0))


ROUND_FORMULAS = {
    "linear": linear,
    "sinusoidal": sinusoidal,
    "circular": circular,
}


def avg_weights(frames: int, windowed: bool, accel: bool = True) -> np.ndarray:
    """Frame-averaging weights for the N-frame history mean.

    ``accel=True`` mirrors the default GPU path
    (shaders/glava/util/average_pass.frag): the ``window`` curve with
    special cases — windowing disabled at ``frames == 2`` and the
    ``window_shallow`` curve at ``frames == 3``.  ``accel=False``
    mirrors the CPU path (render.c:738-771), which uses
    ``window_frame`` unconditionally.  Both divide by ``frames``.
    """
    if frames <= 0:
        raise ValueError("avg frames must be positive")
    f = np.arange(frames, dtype=np.float64)
    if not windowed or frames == 1:
        w = np.ones(frames, dtype=np.float64)
    elif accel:
        if frames == 2:
            w = np.ones(frames, dtype=np.float64)
        elif frames == 3:
            w = window_shallow(f, frames - 1)
        else:
            w = window(f, frames - 1)
    else:
        w = window_frame(f, frames - 1)
    return (w / frames).astype(np.float32)
