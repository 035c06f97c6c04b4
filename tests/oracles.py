"""NumPy oracles transcribing the reference DSP semantics.

Each function is an independent, direct transcription of the math
described in SURVEY.md section 2 / the cited reference lines, written
against numpy for clarity. Unit tests check the JAX/TPU implementations
against these (the unit layer the reference itself lacks; SURVEY.md
section 4).
"""

from __future__ import annotations

import numpy as np

TWOPI = 2.0 * np.pi


def pcm_window(n: int) -> np.ndarray:
    """render.c:794 ``window(i, s->sz - 1)`` AS COMPILED: the macro's
    unparenthesized ``sz`` parameter makes the ``- 1`` a radian phase
    shift on the whole quotient, denominator n (verified against the
    reference's own compiled code, tests/test_refdsp_differential.py)."""
    i = np.arange(n, dtype=np.float64)
    return 0.53836 - 0.46164 * np.cos(TWOPI * i / n - 1.0)


def packed_fft_reference(x: np.ndarray) -> np.ndarray:
    """n real floats -> n interleaved (re, im) floats of the n/2-point
    complex FFT over packed pairs (render.c:797-839 layout)."""
    x = np.asarray(x, dtype=np.float64)
    c = x[0::2] + 1j * x[1::2]
    F = np.fft.fft(c)
    out = np.empty_like(x)
    out[0::2] = F.real
    out[1::2] = F.imag
    return out


def fft_transform(x: np.ndarray, fft_scale: float, fft_cutoff: float) -> np.ndarray:
    """Full transform_fft semantics (render.c:783-847)."""
    x = np.asarray(x, dtype=np.float64)
    n = x.shape[-1]
    v = packed_fft_reference(x * pcm_window(n))
    mag = np.log(np.abs(v) + 1.0) / 3.0
    j = np.arange(n, dtype=np.float64) / n
    boost = np.maximum(j * fft_scale + (1.0 - fft_cutoff), 1.0)
    return mag * boost


def gravity_sequence(frames: np.ndarray, g: float) -> np.ndarray:
    """Apply transform_gravity (render.c:720-736) over a frame sequence."""
    applied = np.zeros(frames.shape[-1], dtype=np.float64)
    out = np.empty_like(frames, dtype=np.float64)
    for i, b in enumerate(frames):
        applied = np.where(b >= applied, b - g, applied - g)
        out[i] = applied
    return out


def average_sequence(frames: np.ndarray, nframes: int, use_window: bool,
                     accel: bool = False) -> np.ndarray:
    """transform_average (render.c:738-771) over a frame sequence.

    accel=True uses the GPU-path weights (average_pass.frag): `window`
    curve via the unhygienic `window(I, _AVG_FRAMES - 1)` macro call
    (shifted -1 rad, denominator F), disabled at 2 frames; the
    window_shallow 3-frame selection in the shader is dead code. The
    shader indexes by AGE (t0 = newest, render.c:2252-2256) so the
    curve is reversed onto this oracle's oldest-first history axis.
    accel=False is the CPU `window_frame(f, avg_frames - 1)` macro
    call, same shifted expansion, applied unconditionally; its
    `bufs[f*sz]` history is oldest-first already (render.c:751-766).
    """
    sz = frames.shape[-1]
    hist = np.zeros((nframes, sz), dtype=np.float64)
    f = np.arange(nframes, dtype=np.float64)
    if not use_window:
        w = np.ones(nframes)
    elif accel:
        if nframes == 2:
            w = np.ones(nframes)
        else:
            w = (0.53836 - 0.46164 * np.cos(TWOPI * f / nframes - 1.0))[::-1]
    else:
        w = 0.6 - 0.4 * np.cos(TWOPI * f / nframes - 1.0)
    out = np.empty_like(frames, dtype=np.float64)
    for i, b in enumerate(frames):
        hist = np.concatenate([hist[1:], b[None]], axis=0)
        out[i] = (hist * w[:, None]).sum(axis=0) / nframes
    return out


def smooth_transform(b: np.ndarray, ratio: float, distance: float) -> np.ndarray:
    """transform_smooth (render.c:694-718) — SEQUENTIAL and IN-PLACE.

    The reference writes ``b[t] = avg`` while later rows still read
    ``b[s]`` for ``s <= t`` (smin = floor(t*e^-distance) can trail t),
    so already-smoothed values feed subsequent neighborhoods, and a
    0/0 neighborhood produces NaN which then PROPAGATES through every
    window that includes it (``if (b[s])`` is true for NaN). Verified
    against the reference's own compiled code
    (tests/test_refdsp_differential.py::test_smooth_differential).
    Final NaNs are mapped to 0 — the one documented deviation.
    """
    b = np.asarray(b, dtype=np.float64).copy()
    sz = b.shape[-1]
    asz = int(np.ceil(sz / ratio))
    for t in range(asz):
        if t == 0:
            db = -np.inf  # log(0); yields the empty [1, 0] range below
        else:
            db = np.log(float(t))
        smin = int(np.floor(np.exp(max(db - distance, 0.0))))
        smax = min(int(np.ceil(np.exp(db + distance))), sz - 1)
        acc, count = 0.0, 0
        for s in range(smin, smax + 1):
            if b[s] != 0.0:  # NaN compares unequal -> included
                acc += b[s]
                count += 1
        b[t] = acc / count if count else np.nan
    # mirror transforms.smooth_transform's documented inf-preserving
    # deviation (only NaN is substituted; +-inf pass through)
    return np.nan_to_num(b, nan=0.0, posinf=np.inf, neginf=-np.inf)


def scale_audio(idx: float, srange: float, sscale: float) -> float:
    return -np.log(-(srange * idx) + 1.0) / sscale


def _round_formula(name: str, x: np.ndarray) -> np.ndarray:
    if name == "linear":
        return x
    if name == "sinusoidal":
        return (0.5 * np.sin((np.pi * x) - (np.pi / 2))) + 0.5
    if name == "circular":
        return np.sqrt(np.maximum(1 - ((x - 1) * (x - 1)), 0))
    raise ValueError(name)


def smooth_audio(tex: np.ndarray, idx: float, *, factor: float = 0.025,
                 mode: str = "average", hybrid_weight: float = 0.65,
                 sscale: float = 8.0, srange: float = 0.9,
                 formula: str = "sinusoidal") -> float:
    """smooth.glsl:23-64, scalar transcription."""
    tex_sz = tex.shape[-1]
    smin = scale_audio(np.clip(idx - factor, 0, 1), srange, sscale) * tex_sz
    smax = scale_audio(np.clip(idx + factor, 0, 1), srange, sscale) * tex_sz
    m = (smax - smin) / 2.0
    rm = smin + m

    def fetch(s):
        return tex[int(np.clip(round(s), 0, tex_sz - 1))]

    def weight(s):
        if m <= 0:
            return 1.0
        return float(_round_formula(formula, np.clip((m - abs(rm - s)) / m, 0, 1)))

    if mode == "average":
        avg, wsum, s = 0.0, 0.0, smin
        while s <= smax:
            w = weight(s)
            wsum += w
            avg += fetch(s) * w
            s += 1.0
        return avg / wsum if wsum else 0.0
    if mode == "maximum":
        vmax, s = 0.0, smin
        while s < smax:
            w = fetch(s) * weight(s)
            vmax = max(vmax, w)
            s += 1.0
        return vmax
    # hybrid
    vmax, avg, wsum, s = 0.0, 0.0, 0.0, smin
    while s < smax:
        w = weight(s)
        wsum += w
        v = fetch(s) * w
        avg += v
        vmax = max(vmax, v)
        s += 1.0
    return vmax * (1 - hybrid_weight) + (avg / wsum if wsum else 0.0) * hybrid_weight
