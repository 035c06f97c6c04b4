"""Differential parity: the JAX chain vs the reference's OWN compiled DSP.

Every test here drives randomized multi-update sequences through
``librefdsp.so`` — the reference transform chain
(glava/render.c:660-848) extracted and compiled unmodified at build
time (glava_tpu/native/Makefile target ``refdsp``) — and asserts the
JAX implementations match.  Unlike ``tests/oracles.py`` (independent
transcriptions), a shared transcription error cannot hide here: the C
side IS the original.

Tolerance note: the reference FFT advances its twiddle factors with a
float32 recurrence (render.c:826-837: ``wr += wr*wpr - wi*wpi``) which
drifts vs our exactly-tabulated DFT matrices; measured worst-case
divergence on the post-log spectrum is ~2e-5 at n=4096 (pure float
noise, zero at the semantic level).  Tolerances below are set ~5x above
the measured float noise and ~100x below any semantic divergence.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from glava_tpu.ops import transforms, windows
from tests import refdsp

pytestmark = pytest.mark.skipif(
    not refdsp.available(),
    reason=f"reference DSP oracle unavailable: {refdsp.build_error()}",
)


def _pcm(rng, *shape):
    """s16-scaled PCM like the FIFO backend produces (1/65535 scaling,
    fifo.c:94-110): values in ~[-0.5, 0.5]."""
    return (rng.integers(-32768, 32768, shape) / 65535.0).astype(np.float32)


# ---------------------------------------------------------------------------
# individual transforms
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("sz", [256, 1024, 2048, 4096])
def test_fft_differential(sz):
    rng = np.random.default_rng(sz)
    ref = refdsp.RefDSP(fft_scale=10.2, fft_cutoff=0.3)
    for _ in range(4):
        x = _pcm(rng, sz)
        got = np.asarray(transforms.fft_chain(jnp.asarray(x), 10.2, 0.3))
        want = ref.fft(x)
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=0)


def test_fft_scale_cutoff_differential():
    rng = np.random.default_rng(7)
    for scale, cutoff in [(10.2, 0.3), (0.0, 0.0), (25.0, 1.0), (3.3, 0.7)]:
        ref = refdsp.RefDSP(fft_scale=scale, fft_cutoff=cutoff)
        x = _pcm(rng, 1024)
        got = np.asarray(transforms.fft_chain(jnp.asarray(x), scale, cutoff))
        np.testing.assert_allclose(got, ref.fft(x), atol=1e-4, rtol=0)


def test_gravity_differential_staggered_clock():
    """Multi-update peak-hold with the update-rate denominator changing
    mid-sequence (render.c:728 recomputes g from the measured ur)."""
    rng = np.random.default_rng(1)
    sz, step = 512, 4.2
    ref = refdsp.RefDSP(gravity_step=step, ur=86.1)
    state = transforms.gravity_init((sz,))
    for i in range(30):
        ur = [86.1, 43.0, 172.3][i % 3]
        ref.set_ur(ur)
        x = rng.uniform(-0.2, 1.2, sz).astype(np.float32)
        want = ref.gravity(x)
        state, got = transforms.gravity_apply(state, jnp.asarray(x), step / ur)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=0)


@pytest.mark.parametrize("use_window", [False, True])
@pytest.mark.parametrize("frames", [1, 2, 3, 6, 9])
def test_average_differential(frames, use_window):
    rng = np.random.default_rng(frames * 2 + use_window)
    sz = 256
    ref = refdsp.RefDSP(avg_frames=frames, avg_window=use_window)
    hist = transforms.avg_init(frames, (sz,))
    w = jnp.asarray(windows.avg_weights(frames, use_window, accel=False))
    for _ in range(3 * frames + 2):
        x = rng.uniform(0.0, 1.0, sz).astype(np.float32)
        want = ref.average(x)
        hist, got = transforms.avg_apply(hist, jnp.asarray(x), w)
        np.testing.assert_allclose(np.asarray(got), want, atol=1e-5, rtol=0)


@pytest.mark.parametrize("ratio,distance", [(4.0, 0.01), (2.0, 0.05), (8.0, 0.2)])
def test_smooth_differential(ratio, distance):
    rng = np.random.default_rng(int(ratio * 10))
    sz = 512
    ref = refdsp.RefDSP(smooth_ratio=ratio, smooth_distance=distance)
    for _ in range(4):
        x = rng.uniform(0.0, 1.0, sz).astype(np.float32)
        x[rng.uniform(size=sz) < 0.15] = 0.0  # exercise the if(b[s]) skip
        want = ref.smooth(x)
        got = np.asarray(transforms.smooth_transform(
            jnp.asarray(x), ratio, distance))
        # t=0 (and any all-zero neighborhood) divides 0/0 in the
        # reference (NaN); we emit 0 — the documented deviation
        # (docs/PARITY.md). Everything else must match.
        assert np.isnan(want[0])
        mask = np.isnan(want)
        np.testing.assert_allclose(got[~mask], want[~mask], atol=1e-5, rtol=0)
        np.testing.assert_array_equal(got[mask], 0.0)


def test_wrange_differential():
    rng = np.random.default_rng(3)
    ref = refdsp.RefDSP()
    x = rng.uniform(-1.0, 1.0, 1024).astype(np.float32)
    got = np.asarray(transforms.wrange(jnp.asarray(x)))
    np.testing.assert_allclose(got, ref.wrange(x), atol=1e-6, rtol=0)


# ---------------------------------------------------------------------------
# composed CPU-path update chain
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("use_window", [False, True])
def test_full_update_chain_differential(use_window):
    """Fresh audio every update through the real reference chain
    (fft -> implied gravity -> implied average, render.c:2150-2155)
    vs fft_update with the CPU path's unclamped carries."""
    rng = np.random.default_rng(11 + use_window)
    sz, frames, step = 1024, 6, 4.2
    ref = refdsp.RefDSP(avg_frames=frames, avg_window=use_window,
                        gravity_step=step, ur=86.1,
                        fft_scale=10.2, fft_cutoff=0.3)
    state = transforms.chain_init(sz, frames)
    w = jnp.asarray(windows.avg_weights(frames, use_window, accel=False))
    for i in range(25):
        ur = [86.1, 60.0, 120.0][i % 3]
        ref.set_ur(ur)
        x = _pcm(rng, sz)
        want = ref.update(x)
        state, got = transforms.fft_update(
            state, jnp.asarray(x), fft_scale=10.2, fft_cutoff=0.3,
            gravity_g=step / ur, avg_weights=w, texture_clamp=False)
        np.testing.assert_allclose(np.asarray(got), want, atol=2e-4, rtol=0)
