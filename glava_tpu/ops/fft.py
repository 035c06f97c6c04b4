"""Packed-complex FFT expressed as batched matrix multiplications.

The reference computes its spectrum with an in-place iterative radix-2
complex FFT over the PCM buffer *viewed as interleaved (re, im) pairs*
(the classic Numerical-Recipes ``four1`` packing, reference:
glava/render.c:783-847). That is: for an ``n``-float real buffer it
performs an ``n/2``-point complex FFT of ``c[k] = x[2k] + i*x[2k+1]``
and then takes ``log(|v| + 1)/3`` of every float (real and imaginary
components *separately*), followed by a linear-in-frequency boost.
We reproduce that observable layout exactly.

TPU-first design: a pointer-chasing butterfly loop is the wrong shape
for the MXU, and XLA's generic FFT lowering wastes the systolic array.
Instead we use the four-step (Cooley-Tukey / Bailey) factorization
``m = m1 * m2``:

    A[n1, n2] = c[n1*m2 + n2]
    B        = W_m1 @ A            # m1-point DFTs down the columns
    C        = B * T               # twiddles  T[k1,n2] = e^{-2pi i k1 n2 / m}
    D        = C @ W_m2^T          # m2-point DFTs along the rows
    X[k1 + m1*k2] = D[k1, k2]

Both steps are dense matmuls against small precomputed DFT matrices —
exactly what the MXU is built for — and batching many windows/streams
turns them into large, well-tiled contractions. Complex arithmetic is
carried as separate (re, im) planes (4 real matmuls per step).

This replaces both the reference CPU FFT and the vendored GLFFT
GL-compute library (glfft/glfft.cpp; radix-pass planning at
glfft.cpp:107-353) whose role here is played by the factor split
chosen in :func:`_split`.
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

_MAX_DIRECT = 256  # single-matmul DFT cutoff; above this use four-step


def _fft_precision():
    """FFT matmul precision policy.

    TPU MXUs take bf16 inputs at default precision; HIGHEST requests
    the 6-pass bf16 decomposition that recovers full f32 accuracy —
    required for spectrum parity with the reference's CPU FFT (oracle
    tests pin ~1e-5). GLAVA_TPU_FAST_MATH=1 opts into the 3-pass
    decomposition instead: ~30% faster full updates (measured 88 ->
    66 us per 64-stream update on v5e) at ~3e-4 texture error —
    visually indistinguishable (golden tolerance is 2e-3) but not
    oracle-exact.
    """
    import os

    if os.environ.get("GLAVA_TPU_FAST_MATH", "") == "1":
        return jax.lax.DotAlgorithmPreset.BF16_BF16_F32_X3
    return jax.lax.Precision.HIGHEST


def _mm(a, b):
    """Accuracy-policy matmul (see _fft_precision)."""
    return jnp.matmul(
        a, b, precision=_fft_precision(),
        preferred_element_type=jnp.float32,
    )


def _split(m: int) -> tuple[int, int]:
    """Choose the m = m1 * m2 factorization (both powers of two).

    Balanced split with m1 >= m2 keeps both DFT matrices small (<= 128
    wide for every realistic buffer size) so they sit in VMEM and tile
    cleanly onto the 128x128 MXU.
    """
    k = m.bit_length() - 1
    m2 = 1 << (k // 2)
    m1 = m // m2
    return m1, m2


def _dft_matrix(size: int) -> tuple[np.ndarray, np.ndarray]:
    k = np.arange(size)
    ang = -2.0 * np.pi * np.outer(k, k) / size
    return (np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32))


@lru_cache(maxsize=None)
def plan_packed_fft(n: int):
    """Build a jittable ``fn(x) -> (re, im)`` for ``n``-float buffers.

    ``x`` has shape ``(..., n)`` (real PCM, already windowed); the
    result planes have shape ``(..., n // 2)`` and hold the complex
    spectrum of the packed pairs, matching the reference's ``four1``
    output order.
    """
    if n < 4 or (n & (n - 1)) != 0:
        raise ValueError(f"packed fft length must be a power of two >= 4, got {n}")
    m = n // 2

    if m <= _MAX_DIRECT:
        wr, wi = _dft_matrix(m)

        def direct(x):
            c = x.reshape(x.shape[:-1] + (m, 2))
            ar, ai = c[..., 0], c[..., 1]
            re = _mm(ar, wr.T) - _mm(ai, wi.T)
            im = _mm(ar, wi.T) + _mm(ai, wr.T)
            return re, im

        return direct

    m1, m2 = _split(m)
    w1r, w1i = _dft_matrix(m1)
    w2r, w2i = _dft_matrix(m2)
    k1 = np.arange(m1)[:, None]
    n2 = np.arange(m2)[None, :]
    ang = -2.0 * np.pi * k1 * n2 / m
    tr = np.cos(ang).astype(np.float32)
    ti = np.sin(ang).astype(np.float32)
    w2tr, w2ti = w2r.T.copy(), w2i.T.copy()

    def four_step(x):
        batch = x.shape[:-1]
        c = x.reshape(batch + (m1, m2, 2))
        ar, ai = c[..., 0], c[..., 1]
        # Column DFTs: contract over n1 (axis -2).
        br = _mm(w1r, ar) - _mm(w1i, ai)
        bi = _mm(w1r, ai) + _mm(w1i, ar)
        # Twiddle.
        cr = br * tr - bi * ti
        ci = br * ti + bi * tr
        # Row DFTs: contract over n2 (axis -1).
        dr = _mm(cr, w2tr) - _mm(ci, w2ti)
        di = _mm(cr, w2ti) + _mm(ci, w2tr)
        # X[k1 + m1*k2] = D[k1, k2]: k2 is the major axis when flattening.
        re = jnp.swapaxes(dr, -1, -2).reshape(batch + (m,))
        im = jnp.swapaxes(di, -1, -2).reshape(batch + (m,))
        return re, im

    return four_step


def interleave(re: jax.Array, im: jax.Array) -> jax.Array:
    """(..., m), (..., m) -> (..., 2m) interleaved [re0, im0, re1, ...]."""
    return jnp.stack([re, im], axis=-1).reshape(re.shape[:-1] + (re.shape[-1] * 2,))


def packed_spectrum(x: jax.Array, fft_scale, fft_cutoff) -> jax.Array:
    """Windowed-PCM -> reference-layout spectrum floats.

    Equivalent to the abs/log/boost tail of the reference transform
    (render.c:841-846): ``log(|v| + 1)/3`` per interleaved float, then
    ``max((j/n)*fft_scale + (1 - fft_cutoff), 1)`` boost.  ``fft_scale``
    / ``fft_cutoff`` may be traced scalars (live-tunable without
    recompilation). Windowing is NOT applied here; see
    ``transforms.fft_chain`` which mirrors the reference's fused
    window+fft transform.
    """
    n = x.shape[-1]
    fft_scale = jnp.asarray(fft_scale)
    fft_cutoff = jnp.asarray(fft_cutoff)
    if fft_scale.ndim:  # per-stream scalars -> broadcast over bins
        fft_scale = fft_scale[..., None]
    if fft_cutoff.ndim:
        fft_cutoff = fft_cutoff[..., None]
    re, im = plan_packed_fft(n)(x)
    v = interleave(re, im)
    mag = jnp.log(jnp.abs(v) + 1.0) / 3.0
    idx = jnp.arange(n, dtype=jnp.float32) / n
    boost = jnp.maximum(idx * fft_scale + (1.0 - fft_cutoff), 1.0)
    return mag * boost
