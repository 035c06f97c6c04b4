"""Renderer/module tests: frames from synthetic audio."""

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer, quantize_frame


def _tone_audio(cfg, freqs=(440.0, 3000.0), amp=0.4, seconds=1.0):
    t = np.arange(int(cfg.sample_rate * seconds)) / cfg.sample_rate
    le = amp * np.sin(2 * np.pi * freqs[0] * t)
    ri = amp * np.sin(2 * np.pi * freqs[1] * t)
    return le.astype(np.float32), ri.astype(np.float32)


def _drive(renderer, n_updates=24, freqs=(440.0, 3000.0)):
    cfg = renderer.cfg
    le, ri = _tone_audio(cfg, freqs)
    state = renderer.init_state()
    step = renderer.jit_step()
    frame = None
    for k in range(n_updates):
        end = (k + 1) * cfg.hop
        snap = np.zeros((2, cfg.bufsize), np.float32)
        for ch, buf in enumerate((le, ri)):
            seg = buf[max(end - cfg.bufsize, 0):end]
            snap[ch, cfg.bufsize - len(seg):] = seg
        state, frame = step(
            state, jnp.asarray(snap), True, np.float32(k / 60.0), np.float32(1.0)
        )
    return np.asarray(frame)


def _load(module, screen=(192, 128), extra=()):
    lc = loader.load(
        cli_requests=(f"setgeometry 0 0 {screen[0]} {screen[1]}",) + tuple(extra),
        force_module=module,
    )
    return Renderer(lc)


@pytest.mark.parametrize("module", ["bars", "radial", "graph", "wave", "circle"])
def test_module_renders_valid_frame(module):
    # radial/circle need room for their C_RADIUS=128 center circle
    screen = (300, 300) if module in ("radial", "circle") else (192, 128)
    r = _load(module, screen=screen)
    frame = _drive(r)
    h, w = r.screen[1], r.screen[0]
    assert frame.shape == (h, w, 4)
    assert frame.dtype == np.float32
    assert not np.isnan(frame).any()
    assert frame.min() >= 0.0 and frame.max() <= 1.0
    assert frame[..., 3].max() > 0.0, f"{module}: nothing drawn"


def test_bars_structure():
    """Bars: colored columns separated by gaps, heights follow audio."""
    r = _load("bars")
    frame = _drive(r)
    alpha = frame[..., 3]
    # baseline row (y=0) inside drawn bars; gap columns empty
    col_drawn = alpha[0] > 0
    assert col_drawn.any()
    # periodic structure: with BAR_WIDTH 5 / GAP 1, some columns stay empty
    assert (~col_drawn).any()
    # no pixels drawn above the tallest bar
    heights = alpha.sum(axis=0)
    assert heights.max() < frame.shape[0]  # not saturated to full screen


def test_bars_silence_is_empty():
    r = _load("bars")
    state = r.init_state()
    step = r.jit_step()
    snap = jnp.zeros((2, r.cfg.bufsize), jnp.float32)
    state, frame = step(state, snap, True, np.float32(0.0), np.float32(1.0))
    f = np.asarray(frame)
    assert f[..., 3].max() == 0.0


def test_wave_line_on_silence():
    """wrange maps silence to 0.5 -> horizontal center line."""
    r = _load("wave")
    state = r.init_state()
    step = r.jit_step()
    snap = jnp.zeros((2, r.cfg.bufsize), jnp.float32)
    state, frame = step(state, snap, True, np.float32(0.0), np.float32(1.0))
    f = np.asarray(frame)
    h = f.shape[0]
    mid = f[h // 2 - 2 : h // 2 + 2, :, 3]
    assert (mid > 0).any(), "center line missing"
    assert f[0, :, 3].max() == 0.0 and f[-1, :, 3].max() == 0.0


def test_radial_ring_present():
    r = _load("radial", screen=(300, 300))
    state = r.init_state()
    step = r.jit_step()
    snap = jnp.zeros((2, r.cfg.bufsize), jnp.float32)
    _, frame = step(state, snap, True, np.float32(0.0), np.float32(1.0))
    f = np.asarray(frame)
    # center circle outline at C_RADIUS=128 from center
    assert f[..., 3].max() > 0
    cy, cx = 150, 150
    assert f[cy, cx, 3] == 0.0  # center empty
    assert f[cy + 128, cx, 3] > 0.0  # on the ring


def test_golden_test_module():
    """The reference CI check: constant premultiplied color everywhere
    (render.c:2419-2453, settesteval 55000055)."""
    lc = loader.load(entry="test_rc.glsl")
    r = Renderer(lc, screen=(64, 64))
    state = r.init_state()
    step = r.jit_step()
    snap = jnp.zeros((2, lc.cfg.bufsize), jnp.float32)
    _, frame = step(state, snap, True, np.float32(0.0), np.float32(1.0))
    assert r.test_evaluate(frame), np.asarray(frame)[0, 0]


def test_quantize_frame():
    f = jnp.asarray([[[0.0, 0.5, 1.0, 1.0 / 3.0]]])
    q = quantize_frame(f)
    assert q.tolist() == [[[0, 128, 255, 85]]]


def test_user_knob_override_changes_output(tmp_path):
    (tmp_path / "rc.glsl").write_text("#request mod bars\n#request setgeometry 0 0 96 64\n")
    (tmp_path / "bars.glsl").write_text(
        "#define COLOR #ff0000\n#define BAR_OUTLINE #ff0000\n#define BAR_WIDTH 3\n#define BAR_GAP 3\n"
    )
    lc = loader.load(user_dir=tmp_path)
    r = Renderer(lc)
    frame = _drive(r, n_updates=12)
    drawn = frame[frame[..., 3] > 0]
    assert drawn.size > 0
    np.testing.assert_allclose(drawn[:, 0], 1.0, atol=1e-6)  # pure red
    np.testing.assert_allclose(drawn[:, 1], 0.0, atol=1e-6)


def test_mirror_mono_layout():
    r = _load("bars", extra=("setmirror true",))
    frame = _drive(r)
    assert frame[..., 3].max() > 0


def test_odd_screen_sizes():
    """No alignment requirements on output geometry."""
    r = _load("bars", screen=(131, 77))
    frame = _drive(r, n_updates=10)
    assert frame.shape == (77, 131, 4)
    assert np.isfinite(frame).all()


def test_bufscale_decimation_path():
    """`setbufscale 2`: spectrum texture is bufsize/2 (render.c:1765-1790)."""
    lc = loader.load(
        cli_requests=("setgeometry 0 0 96 64", "setbufsize 2048",
                      "setsamplesize 256", "setbufscale 2",
                      "setprintframes false"),
        force_module="bars",
    )
    r = Renderer(lc)
    assert r.pipeline.sz == 1024
    frame = _drive(r, n_updates=10)
    assert (frame[..., 3] > 0).any()


def test_planar_constant_channels_stay_concrete(tmp_path):
    """The planar pass contract keeps CONCRETE channels numpy across
    the pass boundary (render/base.as_planes/clip_planes) — constant
    colors must not taint into device arrays, so masks over them fold
    at trace time (the mechanism behind the interpreted radial/circle
    speedups, docs/STATUS.md)."""
    from glava_tpu.render.base import PassInputs

    mod = tmp_path / "pc"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "out vec4 fragment;\n"
        '#request uniform "audio_l" audio_l\n'
        '#request transform audio_l "window"\n'
        '#request transform audio_l "fft"\n'
        "uniform sampler1D audio_l;\n"
        "void main() {\n"
        "  fragment = vec4(0.25, 0.5,"
        " texelFetch(audio_l, ivec2(3, 0), 0).r, 1.0);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod pc\n#request setgeometry 0 0 48 32\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    r = Renderer(loader.load(user_dir=tmp_path))
    state = r.init_state()
    snap = jnp.zeros((2, 1024), jnp.float32)
    chains = r.pipeline.advance(state.chains, snap[0], snap[1],
                                gravity_g=jnp.float32(0.05))
    textures = r.pipeline.textures_from(chains, snap[0], snap[1])
    planes = r.module.render(
        PassInputs(prev=None, textures=textures, time=jnp.float32(0.0)))
    # r, g, a were written from literals: still concrete numpy
    for ch in (0, 1, 3):
        assert isinstance(planes[ch], (np.ndarray, np.generic)), (
            f"channel {ch} tainted to {type(planes[ch]).__name__}")
    # b consumed the audio texture: a traced/device plane
    assert not isinstance(planes[2], (np.ndarray, np.generic))
    assert float(np.asarray(planes[0])) == 0.25
    assert float(np.asarray(planes[3])) == 1.0


def test_interleave_u8_matches_f32_quantize():
    """interleave_u8 (quantize per plane, then stack) is bit-identical
    to quantizing the f32 interleaved frame — the serving wire format
    must not drift from quantize_frame's rounding."""
    from glava_tpu.render.base import interleave, interleave_u8

    rng = np.random.default_rng(11)
    h, w = 17, 23
    planes = (
        jnp.asarray(rng.random((h, w)).astype(np.float32) * 1.4 - 0.2),
        np.float32(0.34999),            # constant channel stays a scalar
        jnp.asarray(rng.random((h, w)).astype(np.float32)),
        np.float32(1.0),
    )
    f32 = np.asarray(interleave(planes, h, w))
    want = np.clip(np.rint(f32 * 255.0), 0, 255).astype(np.uint8)
    got = np.asarray(interleave_u8(planes, h, w))
    assert got.dtype == np.uint8 and got.shape == (h, w, 4)
    assert np.array_equal(got, want)


def test_tap_source_size_gated_default(monkeypatch):
    """The shifted-tap materialization barrier is size-gated by
    default: applied iff the plane has >= PREV_MAT_MIN_ELEMS elements
    (v5e A/B: 1080p wins or washes, 512x256 loses fusion draws —
    scripts/exp_tapmat_native_ab.py). GLAVA_TPU_PREV_MAT=1/0 forces.
    Routing is observable in the jaxpr; values are identity either
    way (pinned by tests/test_halo_fuzz.py)."""
    import jax
    from glava_tpu.render.base import PREV_MAT_MIN_ELEMS, tap_source

    big = (1024, PREV_MAT_MIN_ELEMS // 1024)
    small = (64, 64)

    def has_barrier(shape):
        jaxpr = jax.make_jaxpr(lambda p: tap_source(p) * 2.0)(
            jnp.zeros(shape, jnp.float32))
        return "optimization_barrier" in str(jaxpr)

    monkeypatch.delenv("GLAVA_TPU_PREV_MAT", raising=False)
    assert has_barrier(big) and not has_barrier(small)
    monkeypatch.setenv("GLAVA_TPU_PREV_MAT", "1")
    assert has_barrier(big) and has_barrier(small)
    monkeypatch.setenv("GLAVA_TPU_PREV_MAT", "0")
    assert not has_barrier(big) and not has_barrier(small)
    # numpy planes always pass through untouched (stay concrete)
    monkeypatch.setenv("GLAVA_TPU_PREV_MAT", "1")
    arr = np.zeros(big, np.float32)
    assert tap_source(arr) is arr


def test_prev_mat_mode_rejects_typos(monkeypatch):
    """Unrecognized GLAVA_TPU_PREV_MAT values ('on', '2', 'auto ')
    must not silently force-or-skip the barrier — they warn once and
    fall back to the size-gated auto (docs/CLI.md: '=1/=0 force')."""
    import warnings

    from glava_tpu.render import base

    monkeypatch.setenv("GLAVA_TPU_PREV_MAT", "on")
    monkeypatch.setattr(base, "_PREV_MAT_WARNED", set())
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert base.prev_mat_mode() == "auto"
        assert base.prev_mat_mode() == "auto"  # warns once, not twice
    msgs = [str(w.message) for w in rec if "GLAVA_TPU_PREV_MAT" in
            str(w.message)]
    assert len(msgs) == 1 and "'on'" in msgs[0]
    for ok in ("0", "1", "auto"):
        monkeypatch.setenv("GLAVA_TPU_PREV_MAT", ok)
        assert base.prev_mat_mode() == ok
