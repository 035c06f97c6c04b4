"""Log-mel spectrogram frontend sharing the packed-FFT kernel.

BASELINE.json config #5 (stretch): Whisper-style 80-bin log-mel
features computed with the same MXU matmul FFT the visualizer uses.
The packed-pair complex FFT is recombined into the true real FFT with
the standard split step, then the mel projection is one more matmul —
the whole frontend is three MXU contractions per frame batch.

No reference equivalent (GLava has no ML frontend); parameters follow
the Whisper preprocessing convention (25 ms window / 10 ms hop at
16 kHz, 80 mels, log10 clamp + dynamic-range normalization).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from glava_tpu.ops.fft import plan_packed_fft


def rfft_via_packed(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Real FFT of (..., n) via the packed-pair complex FFT.

    Returns (re, im) of bins 0..n/2 inclusive (n/2+1 bins). Uses the
    split/recombination identity: with C = FFT(x_even + i*x_odd) of
    length m = n/2,

        X[k] = (C[k] + conj(C[m-k]))/2 - (i/2) e^{-2pi i k/n}
               (C[k] - conj(C[m-k]))
    """
    n = x.shape[-1]
    m = n // 2
    cr, ci = plan_packed_fft(n)(x)
    # index m-k (with C[m] == C[0])
    idx = (-jnp.arange(m + 1)) % m
    crk = jnp.concatenate([cr, cr[..., :1]], axis=-1)
    cik = jnp.concatenate([ci, ci[..., :1]], axis=-1)
    cr_k = crk[..., : m + 1]
    ci_k = cik[..., : m + 1]
    cr_mk = cr[..., idx]
    ci_mk = ci[..., idx]
    # even part E = (C[k] + conj(C[m-k]))/2 ; odd part O = (C[k] - conj)/2i
    er = (cr_k + cr_mk) / 2.0
    ei = (ci_k - ci_mk) / 2.0
    orr = (ci_k + ci_mk) / 2.0
    oi = -(cr_k - cr_mk) / 2.0
    ang = -2.0 * np.pi * np.arange(m + 1) / n
    tw_r = jnp.asarray(np.cos(ang), jnp.float32)
    tw_i = jnp.asarray(np.sin(ang), jnp.float32)
    re = er + orr * tw_r - oi * tw_i
    im = ei + orr * tw_i + oi * tw_r
    return re, im


def hz_to_mel(f):
    return 2595.0 * np.log10(1.0 + np.asarray(f, dtype=np.float64) / 700.0)


def mel_to_hz(mel):
    return 700.0 * (10.0 ** (np.asarray(mel, dtype=np.float64) / 2595.0) - 1.0)


@lru_cache(maxsize=None)
def mel_filterbank(
    n_fft: int, n_mels: int = 80, sample_rate: int = 16000,
    fmin: float = 0.0, fmax: float | None = None,
) -> np.ndarray:
    """(n_mels, n_fft//2 + 1) triangular filterbank (HTK mel scale)."""
    fmax = fmax if fmax is not None else sample_rate / 2.0
    n_bins = n_fft // 2 + 1
    fft_freqs = np.arange(n_bins) * sample_rate / n_fft
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fb = np.zeros((n_mels, n_bins), dtype=np.float32)
    for i in range(n_mels):
        lo, ctr, hi = hz_pts[i], hz_pts[i + 1], hz_pts[i + 2]
        up = (fft_freqs - lo) / max(ctr - lo, 1e-9)
        down = (hi - fft_freqs) / max(hi - ctr, 1e-9)
        fb[i] = np.maximum(0.0, np.minimum(up, down))
    return fb


@lru_cache(maxsize=None)
def _hann(win_length: int, n_fft: int) -> np.ndarray:
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    out = np.zeros(n_fft, dtype=np.float32)
    off = (n_fft - win_length) // 2
    out[off : off + win_length] = w
    return out


def log_mel(
    frames: jax.Array,
    *,
    n_mels: int = 80,
    sample_rate: int = 16000,
    win_length: int = 400,
    normalize: bool = True,
) -> jax.Array:
    """(..., n_fft) centered PCM frames -> (..., n_mels) log-mel features.

    ``n_fft`` is the trailing frame length (power of two; pad the
    Whisper 400-sample window into 512). Whisper-style post:
    log10(max(mel, 1e-10)), clamp to max-8, (x+4)/4 when ``normalize``.
    """
    n_fft = frames.shape[-1]
    window = jnp.asarray(_hann(win_length, n_fft))
    re, im = rfft_via_packed(frames * window)
    power = re * re + im * im
    fb = jnp.asarray(mel_filterbank(n_fft, n_mels, sample_rate))
    mel = jnp.einsum(
        "mk,...k->...m", fb, power,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    logmel = jnp.log10(jnp.maximum(mel, 1e-10))
    if normalize:
        # global dynamic-range clamp (Whisper convention)
        logmel = jnp.maximum(logmel, jnp.max(logmel) - 8.0)
        logmel = (logmel + 4.0) / 4.0
    return logmel


def frame_track(pcm: np.ndarray, n_fft: int = 512, hop: int = 160) -> np.ndarray:
    """Host helper: center-padded framing of a PCM track into
    (n_frames, n_fft) windows."""
    pad = n_fft // 2
    x = np.pad(np.asarray(pcm, np.float32), (pad, pad), mode="reflect")
    n_frames = 1 + (len(x) - n_fft) // hop
    out = np.stack([x[i * hop : i * hop + n_fft] for i in range(n_frames)])
    return out.astype(np.float32)
