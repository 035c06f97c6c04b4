"""Log-mel frontend tests vs numpy reference."""

import numpy as np
import jax.numpy as jnp

from glava_tpu.models import mel


def test_rfft_via_packed_matches_numpy():
    rng = np.random.default_rng(5)
    for n in (256, 512, 1024):
        x = rng.standard_normal(n).astype(np.float32)
        re, im = mel.rfft_via_packed(jnp.asarray(x))
        want = np.fft.rfft(x.astype(np.float64))
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(np.asarray(re) / scale, want.real / scale, atol=2e-5)
        np.testing.assert_allclose(np.asarray(im) / scale, want.imag / scale, atol=2e-5)


def test_rfft_batched():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((4, 512)).astype(np.float32)
    re, im = mel.rfft_via_packed(jnp.asarray(x))
    assert re.shape == (4, 257)
    for b in range(4):
        want = np.fft.rfft(x[b].astype(np.float64))
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(np.asarray(re[b]) / scale, want.real / scale, atol=2e-5)


def test_mel_filterbank_shape_and_coverage():
    fb = mel.mel_filterbank(512, 80, 16000)
    assert fb.shape == (80, 257)
    assert (fb >= 0).all()
    # every filter has support; interior bins covered
    assert (fb.sum(axis=1) > 0).all()


def test_log_mel_whisper_style():
    rng = np.random.default_rng(7)
    sr = 16000
    t = np.arange(sr) / sr
    pcm = (0.5 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    frames = mel.frame_track(pcm, n_fft=512, hop=160)
    feats = mel.log_mel(jnp.asarray(frames))
    f = np.asarray(feats)
    assert f.shape == (frames.shape[0], 80)
    assert np.isfinite(f).all()
    # normalized range: (clamped to peak-8 then (x+4)/4)
    assert f.max() <= 2.0 and f.min() >= f.max() - 2.0 - 1e-6
    # a 440 Hz tone concentrates energy in a consistent low-mel band
    peak_bins = f.argmax(axis=1)
    assert np.median(peak_bins) < 30


def test_log_mel_oracle():
    """Cross-check one frame against a pure-numpy computation."""
    rng = np.random.default_rng(8)
    frame = rng.standard_normal(512).astype(np.float32) * 0.3
    got = np.asarray(mel.log_mel(jnp.asarray(frame[None]), normalize=False))[0]

    w = np.zeros(512)
    win = 0.5 - 0.5 * np.cos(2 * np.pi * np.arange(400) / 400)
    w[56:456] = win
    spec = np.fft.rfft(frame * w)
    power = np.abs(spec) ** 2
    fb = mel.mel_filterbank(512, 80, 16000)
    want = np.log10(np.maximum(fb @ power, 1e-10))
    np.testing.assert_allclose(got, want, atol=1e-3)
