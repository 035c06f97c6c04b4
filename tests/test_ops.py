"""Unit tests: DSP operators vs NumPy oracles (SURVEY.md section 4)."""

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.ops import fft as gfft
from glava_tpu.ops import smoothing, transforms, windows
from tests import oracles


@pytest.mark.parametrize("n", [64, 256, 512, 1024, 2048, 4096, 8192])
def test_packed_fft_matches_reference_layout(n):
    rng = np.random.default_rng(7)
    x = rng.standard_normal(n).astype(np.float32)
    re, im = gfft.plan_packed_fft(n)(jnp.asarray(x))
    got = np.asarray(gfft.interleave(re, im))
    want = oracles.packed_fft_reference(x)
    scale = max(np.abs(want).max(), 1.0)
    np.testing.assert_allclose(got / scale, want / scale, atol=2e-5)


def test_packed_fft_batched():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((5, 1024)).astype(np.float32)
    re, im = gfft.plan_packed_fft(1024)(jnp.asarray(x))
    got = np.asarray(gfft.interleave(re, im))
    for b in range(5):
        want = oracles.packed_fft_reference(x[b])
        scale = max(np.abs(want).max(), 1.0)
        np.testing.assert_allclose(got[b] / scale, want / scale, atol=2e-5)


@pytest.mark.parametrize("n", [1024, 4096])
def test_fft_chain(n):
    rng = np.random.default_rng(11)
    x = (rng.standard_normal(n) * 0.2).astype(np.float32)
    got = np.asarray(transforms.fft_chain(jnp.asarray(x), 10.2, 0.3))
    want = oracles.fft_transform(x, 10.2, 0.3)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_window_matches_reference():
    n = 1024
    got = windows.pcm_window(n)
    want = oracles.pcm_window(n)
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_gravity_sequence():
    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 1, size=(20, 64))
    g = 4.2 / 86.0
    state = transforms.gravity_init((64,))
    outs = []
    for f in frames:
        state, out = transforms.gravity_apply(state, jnp.asarray(f, jnp.float32), g)
        outs.append(np.asarray(out))
    want = oracles.gravity_sequence(frames, g)
    np.testing.assert_allclose(np.stack(outs), want, atol=1e-5)


@pytest.mark.parametrize("nframes,use_window,accel", [
    (6, True, False), (6, True, True), (5, False, True),
    (2, True, True), (3, True, True), (1, True, True),
])
def test_average_sequence(nframes, use_window, accel):
    rng = np.random.default_rng(9)
    frames = rng.uniform(0, 1, size=(12, 32))
    w = jnp.asarray(windows.avg_weights(nframes, use_window, accel))
    hist = transforms.avg_init(nframes, (32,))
    outs = []
    for f in frames:
        hist, out = transforms.avg_apply(hist, jnp.asarray(f, jnp.float32), w)
        outs.append(np.asarray(out))
    want = oracles.average_sequence(frames, nframes, use_window, accel)
    np.testing.assert_allclose(np.stack(outs), want, atol=1e-5)


def test_average_batched_matches_loop():
    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 1, size=(4, 3, 32)).astype(np.float32)  # batch 3
    w = jnp.asarray(windows.avg_weights(4, True, True))
    hist = transforms.avg_init(4, (3, 32))
    for f in frames:
        hist, out = transforms.avg_apply(hist, jnp.asarray(f), w)
    for b in range(3):
        want = oracles.average_sequence(frames[:, b], 4, True, True)[-1]
        np.testing.assert_allclose(np.asarray(out)[b], want, atol=1e-5)


def test_smooth_transform():
    rng = np.random.default_rng(13)
    b = rng.uniform(0, 1, size=256)
    b[rng.uniform(size=256) < 0.2] = 0.0  # exercise the nonzero-skip path
    got = np.asarray(transforms.smooth_transform(jnp.asarray(b, jnp.float32), 4.0, 0.01))
    want = oracles.smooth_transform(b, 4.0, 0.01)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_wrange():
    x = np.linspace(-1, 1, 17).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(transforms.wrange(jnp.asarray(x))), (x + 1) / 2, rtol=1e-6
    )


def test_decimate():
    x = np.arange(16, dtype=np.float32)
    got = np.asarray(transforms.decimate(jnp.asarray(x), 4))
    np.testing.assert_allclose(got, x.reshape(4, 4).mean(axis=1))
    np.testing.assert_allclose(
        np.asarray(transforms.decimate(jnp.asarray(x), 1)), x
    )


def test_interpolate_clamps():
    s = jnp.zeros(4)
    e = jnp.ones(4)
    np.testing.assert_allclose(np.asarray(transforms.interpolate(s, e, 0.5, 1)), 0.5)
    np.testing.assert_allclose(np.asarray(transforms.interpolate(s, e, 0.5, 10)), 1.0)


@pytest.mark.parametrize("mode", ["average", "maximum", "hybrid"])
@pytest.mark.parametrize("formula", ["linear", "sinusoidal", "circular"])
def test_smooth_audio_resample(mode, formula):
    rng = np.random.default_rng(21)
    tex = rng.uniform(0, 1, size=2048).astype(np.float32)
    positions = np.linspace(0.0, 1.0, 37)
    params = smoothing.SmoothParams(
        factor=0.025, sample_mode=mode, round_formula=formula
    )
    op = smoothing.build_resample(2048, positions, params)
    got = np.asarray(op(jnp.asarray(tex)))
    want = np.array([
        oracles.smooth_audio(tex, p, factor=0.025, mode=mode, formula=formula)
        for p in positions
    ])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_presmooth_then_fetch_matches_direct():
    """Default path: smooth_pass pre-resample + texel fetch (smooth.glsl:62)."""
    rng = np.random.default_rng(23)
    sz = 512
    tex = rng.uniform(0, 1, size=sz).astype(np.float32)
    op = smoothing.presmooth_op(sz, smoothing.SmoothParams())
    pre = op(jnp.asarray(tex))
    idx = jnp.asarray([0.1, 0.33, 0.7])
    got = np.asarray(smoothing.presmoothed_fetch(pre, idx))
    want = np.array([
        oracles.smooth_audio(tex, round(float(i) * sz) / sz)
        for i in [0.1, 0.33, 0.7]
    ])
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_fft_update_composes():
    rng = np.random.default_rng(31)
    sz, frames = 1024, 6
    pcm = rng.standard_normal((10, sz)).astype(np.float32) * 0.1
    w = jnp.asarray(windows.avg_weights(frames, True, True))
    state = transforms.chain_init(sz, frames)
    g = 4.2 / 86.0
    for t in range(10):
        state, out = transforms.fft_update(
            state, jnp.asarray(pcm[t]),
            fft_scale=10.2, fft_cutoff=0.3, gravity_g=g, avg_weights=w,
            texture_clamp=False,
        )
    specs = np.stack([oracles.fft_transform(p, 10.2, 0.3) for p in pcm])
    grav = oracles.gravity_sequence(specs, g)
    want = oracles.average_sequence(grav, frames, True, True)[-1]
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)


def test_fft_update_texture_clamp():
    """Default (accel) path: GL_R16 stages clamp every write to [0,1]."""
    rng = np.random.default_rng(33)
    sz, frames = 1024, 4
    pcm = rng.standard_normal((8, sz)).astype(np.float32)  # loud -> spec > 1
    w = jnp.asarray(windows.avg_weights(frames, True, True))
    state = transforms.chain_init(sz, frames)
    g = 4.2 / 86.0
    clamped = np.zeros(sz)
    hist = np.zeros((frames, sz))
    wts = np.asarray(windows.avg_weights(frames, True, True), dtype=np.float64)
    for t in range(8):
        state, out = transforms.fft_update(
            state, jnp.asarray(pcm[t]),
            fft_scale=10.2, fft_cutoff=0.3, gravity_g=g, avg_weights=w,
        )
        spec = np.clip(oracles.fft_transform(pcm[t], 10.2, 0.3), 0, 1)
        clamped = np.clip(np.maximum(clamped, spec) - g, 0, 1)
        hist = np.concatenate([hist[1:], clamped[None]], axis=0)
    want = np.clip((hist * wts[:, None]).sum(axis=0), 0, 1)
    np.testing.assert_allclose(np.asarray(out), want, atol=2e-4)
    assert float(np.asarray(out).max()) <= 1.0


def test_banded_resample_matches_dense(monkeypatch):
    """Block-banded average resample (the huge-buffer form) agrees
    with the dense matmul on both call forms."""
    rng = np.random.default_rng(29)
    sz = 4096
    params = smoothing.SmoothParams()
    pos = np.arange(sz, dtype=np.float64) / sz

    monkeypatch.setenv("GLAVA_TPU_BANDED", "0")
    dense = smoothing.build_resample(sz, pos, params)
    monkeypatch.setenv("GLAVA_TPU_BANDED", "1")
    banded = smoothing.build_resample(sz, pos, params)
    assert dense.banded is None and banded.banded is not None
    # the banded blocks store a fraction of the dense band
    B, R, Kb = banded.banded.blocks.shape
    assert B * R * Kb < dense.matrix.shape[0] * dense.matrix.shape[1]

    tex = rng.uniform(0, 1, size=(3, sz)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(banded(jnp.asarray(tex))),
        np.asarray(dense(jnp.asarray(tex))), atol=2e-6)

    m = sz // 2
    re = rng.standard_normal((2, m)).astype(np.float32)
    im = rng.standard_normal((2, m)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(banded.apply_planes(jnp.asarray(re), jnp.asarray(im))),
        np.asarray(dense.apply_planes(jnp.asarray(re), jnp.asarray(im))),
        atol=2e-6)


def test_static_table_lookup_matches_gather():
    """Sorted-block static-index lookup (interpret mode): exact vs the
    plain numpy gather across shapes, coherent and incoherent index
    patterns, and the small-input fallback."""
    from glava_tpu.ops.pallas.lookup import build_static_table_lookup

    rng = np.random.default_rng(7)
    cases = [
        ((3, 5000), 512, True),     # multi-row, coherent
        ((97,), 256, True),         # small -> dense fallback
        ((2, 40000), 8192, True),   # large, coherent
        ((2, 40000), 8192, False),  # large, incoherent (tail bucket)
    ]
    import jax

    for shape, T, coherent in cases:
        idx = rng.integers(0, T, shape).astype(np.int32)
        if coherent:
            idx = np.sort(idx, axis=-1)
        lk = build_static_table_lookup(idx, T, interpret=True)
        tab = rng.random(T, dtype=np.float32)
        out = np.asarray(lk(jnp.asarray(tab)))
        assert out.shape == shape
        assert np.array_equal(out, tab[idx]), (shape, T, coherent)
        # batched: the custom_vmap rule routes to the subgroup kernel;
        # must stay exact per table
        tabs = rng.random((3, T), dtype=np.float32)
        outs = np.asarray(jax.vmap(lk)(jnp.asarray(tabs)))
        for s in range(3):
            assert np.array_equal(outs[s], tabs[s][idx]), \
                (shape, T, coherent, "vmapped")


def test_fetch_1d_static_routing_parity(monkeypatch):
    """_fetch_1d's concrete-plane branch routes through the static
    sorted-block lookup (forced on CPU with GLAVA_TPU_STATIC_LK=
    interpret) and must match the plain gather exactly; traced inputs
    and the disabled mode take the gather path."""
    import jax

    from glava_tpu.config.glsl_shader import _fetch_1d, _STATIC_LK_CACHE

    sz = 1024
    rng = np.random.default_rng(3)
    tex = jnp.asarray(rng.random(sz, dtype=np.float32))
    i = np.sort(rng.integers(-5, sz + 5, (300, 300))).astype(np.int64)

    monkeypatch.setenv("GLAVA_TPU_STATIC_LK", "interpret")
    _STATIC_LK_CACHE.clear()
    got = np.asarray(_fetch_1d(tex, i, sz))
    assert _STATIC_LK_CACHE, "static path did not engage"
    monkeypatch.setenv("GLAVA_TPU_STATIC_LK", "0")
    want = np.asarray(_fetch_1d(tex, i, sz))
    assert np.array_equal(got, want)
    # eager device arrays must NOT hit the static bake
    monkeypatch.setenv("GLAVA_TPU_STATIC_LK", "interpret")
    _STATIC_LK_CACHE.clear()
    got_dev = np.asarray(_fetch_1d(tex, jnp.asarray(np.clip(i, 0, sz - 1)),
                                   sz))
    assert not _STATIC_LK_CACHE, "device array leaked into static bake"
    assert np.array_equal(got_dev, want)


def test_banded_default_at_presmooth_size(monkeypatch):
    """The no-wisdom default goes block-banded for big narrow-window
    matrices: the smooth-pass operator at the default bufsize (4096)
    is a 21 MB dense constant read per update whose banded form the
    one-process TPU A/B measured +29% bars / +23% radial @1080p
    (scripts/exp_banded_presmooth_ab.py) — so the heuristic must pick
    banded there WITHOUT a wisdom record, while small matrices stay
    dense and GLAVA_TPU_BANDED=0 still forces the dense matmul."""
    from glava_tpu.ops import autotune, smoothing

    monkeypatch.delenv("GLAVA_TPU_BANDED", raising=False)
    monkeypatch.setattr(autotune, "selected_banded", lambda sz: None)
    p = smoothing.SmoothParams()

    pos = np.arange(4096, dtype=np.float64) / 4096
    op = smoothing.build_resample(4096, pos, p)
    assert op.banded is not None, "presmooth@4096 must default banded"
    dense = smoothing.build_resample(4096, pos, p, banded=False)
    assert op.banded.blocks.nbytes * 2 <= dense.matrix.nbytes
    rng = np.random.default_rng(11)
    t = jnp.asarray(rng.uniform(0, 1, 4096).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op(t)), np.asarray(dense(t)),
                               atol=2e-6)

    # small matrices stay on the dense matmul (banding overhead only
    # pays off once the constant read dominates)
    small = smoothing.build_resample(
        1024, np.arange(1024, dtype=np.float64) / 1024, p)
    assert small.banded is None and small.matrix is not None

    # env force still wins over the size heuristic
    monkeypatch.setenv("GLAVA_TPU_BANDED", "0")
    forced = smoothing.build_resample(4096, pos, p)
    assert forced.banded is None and forced.matrix is not None


def test_build_resample_banded_override_and_wisdom(monkeypatch):
    """build_resample honors the explicit banded override (any tile,
    exact parity with dense) and consults the persisted wisdom record
    for the crossover + tile when no override/env is present."""
    import jax.numpy as jnp

    from glava_tpu.ops import autotune, smoothing

    p = smoothing.SmoothParams()
    pos = np.arange(640) / 640.0
    dense = smoothing.build_resample(640, pos, p, banded=False)
    rng = np.random.default_rng(3)
    t = jnp.asarray(rng.random(640).astype(np.float32))
    want = np.asarray(dense(t))
    for tile in (64, 256):
        op = smoothing.build_resample(640, pos, p, banded=True,
                                      banded_tile=tile)
        assert op.banded is not None
        assert op.banded.blocks.shape[1] == tile
        np.testing.assert_allclose(np.asarray(op(t)), want, atol=2e-6)

    # wisdom consult: a persisted record drives both mode and tile
    monkeypatch.delenv("GLAVA_TPU_BANDED", raising=False)
    monkeypatch.setattr(
        autotune, "selected_banded",
        lambda sz: {"mode": "banded", "tile": 64, "source": "measured"})
    op = smoothing.build_resample(640, pos, p)
    assert op.banded is not None and op.banded.blocks.shape[1] == 64
    monkeypatch.setattr(autotune, "selected_banded",
                        lambda sz: {"mode": "dense", "tile": 128})
    op = smoothing.build_resample(640, pos, p)
    assert op.banded is None and op.matrix is not None
