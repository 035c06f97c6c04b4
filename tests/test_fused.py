"""Fused Pallas kernel tests (interpret mode on CPU) vs the unfused path."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.ops import transforms, windows
from glava_tpu.ops.pallas import fused
from glava_tpu.pipeline import AudioPipeline, UniformSpec


def _weights(F):
    return tuple(float(x) for x in windows.avg_weights(F, True, True))


@pytest.mark.parametrize("n", [512, 1024, 4096])
def test_fused_matches_unfused(n):
    F, B = 5, 8
    fn = fused.build_fused_update(n, F, _weights(F), batch_tile=4, interpret=True)
    rng = np.random.default_rng(0)
    grav = jnp.zeros((B, 2, n // 2), jnp.float32)
    hist = jnp.zeros((B, F, 2, n // 2), jnp.float32)
    g = 0.05
    state = transforms.chain_init(n, F, batch=(B,))
    w = jnp.asarray(windows.avg_weights(F, True, True))
    # fresh audio every update: exposes slot-vs-age weighting mistakes
    # that steady-state (constant-pcm) histories mask
    for it in range(7):
        pcm = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32) * 0.3)
        state, want = transforms.fft_update(
            state, pcm, fft_scale=10.2, fft_cutoff=0.3, gravity_g=g,
            avg_weights=w,
        )
        avg, grav, hist = fn(pcm, grav, hist, it % F, 10.2, 0.3, g)
    got = np.asarray(fused.interleave_planes(avg))
    np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_fused_per_row_params():
    """Per-stream fft_scale/cutoff/gravity as (B,) vectors."""
    n, F, B = 512, 3, 4
    fn = fused.build_fused_update(n, F, _weights(F), batch_tile=4, interpret=True)
    rng = np.random.default_rng(1)
    pcm = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32) * 0.3)
    grav = jnp.zeros((B, 2, n // 2), jnp.float32)
    hist = jnp.zeros((B, F, 2, n // 2), jnp.float32)
    scales = jnp.asarray([5.0, 10.2, 20.0, 1.0])
    cuts = jnp.asarray([0.1, 0.3, 0.5, 0.0])
    gs = jnp.asarray([0.01, 0.05, 0.2, 0.5])
    avg, grav, hist = fn(pcm, grav, hist, 0, scales, cuts, gs)
    w = jnp.asarray(windows.avg_weights(F, True, True))
    for b in range(B):
        st = transforms.chain_init(n, F)
        st, want = transforms.fft_update(
            st, pcm[b], fft_scale=float(scales[b]), fft_cutoff=float(cuts[b]),
            gravity_g=float(gs[b]), avg_weights=w,
        )
        got = np.asarray(fused.interleave_planes(avg))[b]
        np.testing.assert_allclose(got, np.asarray(want), atol=2e-5)


def test_pipeline_fused_vs_unfused_textures():
    """Full pipeline (advance + textures) parity on the bars chain."""
    lc = loader.load(
        cli_requests=("setbufsize 1024", "setsamplesize 256",
                      "setprintframes false"),
        force_module="bars",
    )
    uniforms = [
        UniformSpec("audio_l", "audio_l", ("window", "fft", "gravity", "avg")),
        UniformSpec("audio_r", "audio_r", ("window", "fft", "gravity", "avg")),
    ]
    # force the fused path in interpret mode by patching the builder
    pf = AudioPipeline(lc.cfg, uniforms, use_fused=True)
    pf._fused = fused.build_fused_update_inc(
        pf.sz, lc.cfg.avg_frames,
        tuple(float(x) for x in np.asarray(pf.avg_weights)),
        batch_tile=2, interpret=True,
    )
    pu = AudioPipeline(lc.cfg, uniforms, use_fused=False)

    rng = np.random.default_rng(2)
    sf, su = pf.init_state(), pu.init_state()
    for _ in range(7):
        al = jnp.asarray(rng.standard_normal((1024,)).astype(np.float32) * 0.3)
        ar = jnp.asarray(rng.standard_normal((1024,)).astype(np.float32) * 0.3)
        sf, tf = pf.update(sf, al, ar)
        su, tu = pu.update(su, al, ar)
    for k in tf:
        np.testing.assert_allclose(
            np.asarray(tf[k]), np.asarray(tu[k]), atol=5e-5
        )


@pytest.mark.parametrize("builder", ["inc", "ring"])
def test_fused_per_stream_slot_counters(builder):
    """Streams updating on independent clocks (staggered `modified`
    masks) keep exact per-stream averaging ages on the fused path —
    parity with the unfused path, whose history is per-row by
    construction (reference per-renderer history, render.c:738-771)."""
    from glava_tpu.config import loader
    from glava_tpu.parallel.batch import BatchedRenderer

    build = (fused.build_fused_update_inc if builder == "inc"
             else fused.build_fused_update_ring)
    lc = loader.load(
        cli_requests=("setgeometry 0 0 48 32", "setbufsize 1024",
                      "setsamplesize 256", "setprintframes false"),
        force_module="bars",
    )
    S = 4
    bf = BatchedRenderer(lc, n_streams=S)
    bf.renderer.pipeline.use_fused = True
    bf.renderer.pipeline._fused = build(
        bf.renderer.pipeline.sz, lc.cfg.avg_frames,
        tuple(float(x) for x in np.asarray(bf.renderer.pipeline.avg_weights)),
        batch_tile=4, interpret=True,
    )
    bu = BatchedRenderer(lc, n_streams=S)
    assert not bu.renderer.pipeline.use_fused

    rng = np.random.default_rng(3)
    sf = bf.renderer.pipeline.init_state(batch=(S,))
    su = bu.renderer.pipeline.init_state(batch=(S,))
    g = jnp.full((S,), 0.05, jnp.float32)
    # stream s updates every (s+1)-th step: fully independent clocks
    for it in range(12):
        audio = jnp.asarray(
            rng.standard_normal((S, 2, 1024)).astype(np.float32) * 0.3
        )
        modified = jnp.asarray([(it % (s + 1)) == 0 for s in range(S)])
        adv_f = bf.renderer.pipeline.advance(
            sf, audio[:, 0], audio[:, 1], gravity_g=g
        )
        sf = bf.renderer.pipeline.select_updated(adv_f, sf, modified)
        adv_u = bu.renderer.pipeline.advance(
            su, audio[:, 0], audio[:, 1], gravity_g=g
        )
        su = bu.renderer.pipeline.select_updated(adv_u, su, modified)
    tf = bf.renderer.pipeline.textures_from(sf, audio[:, 0], audio[:, 1])
    tu = bu.renderer.pipeline.textures_from(su, audio[:, 0], audio[:, 1])
    for k in tf:
        np.testing.assert_allclose(
            np.asarray(tf[k]), np.asarray(tu[k]), atol=5e-5
        )


def test_fused_unsupported_configs_fall_back():
    from glava_tpu.pipeline import _fused_supported
    from glava_tpu.config.state import RenderConfig

    us = [UniformSpec("audio_l", "audio_l", ("window", "fft", "gravity", "avg"))]
    assert _fused_supported(RenderConfig(bufsize=4096), us)
    assert not _fused_supported(RenderConfig(bufsize=4096, accel_fft=False), us)
    assert not _fused_supported(RenderConfig(bufsize=384), us)
    odd = [UniformSpec("audio_l", "audio_l", ("fft", "smooth"))]
    assert not _fused_supported(RenderConfig(bufsize=4096), odd)


def test_autotune_wisdom_roundtrip(tmp_path, monkeypatch):
    from glava_tpu.ops import autotune

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._cache = None
    assert autotune.best_batch_tile(4096, 5) == (
        autotune.DEFAULT_TILE, autotune.DEFAULT_MEGACORE)
    # seed a wisdom entry and check it is honored
    key = autotune._key(4096, 5)
    autotune._cache = {key: {"batch_tile": 4}}
    autotune._save(autotune._cache)
    autotune._cache = None
    assert autotune.best_batch_tile(4096, 5) == (4, autotune.DEFAULT_MEGACORE)
    autotune._cache = None


def test_path_wisdom_selection(tmp_path, monkeypatch):
    """selected_path honors persisted records, falls back across stream
    counts, and defaults to the measured-default (XLA) otherwise; the
    record carries the justifying measurements for bench reporting."""
    from glava_tpu.ops import autotune

    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    autotune._cache = None
    rec = autotune.selected_path(4096, 6)
    assert rec["path"] == autotune.DEFAULT_PATH
    assert rec["source"] == "default"

    stored = {"path": "pallas", "source": "measured", "streams": 32,
              "us_per_update": {"xla": 80.0, "pallas": 70.0},
              "batch_tile": 8}
    autotune._cache = {autotune._path_key(4096, 6, 32): stored}
    autotune._save(autotune._cache)
    autotune._cache = None
    # exact-stream hit
    assert autotune.selected_path(4096, 6, streams=32) == stored
    # cross-stream fallback for the same (n, frames)
    assert autotune.selected_path(4096, 6, streams=64) == stored
    # different shape -> default
    assert autotune.selected_path(2048, 6)["source"] == "default"
    autotune._cache = None


def test_learn_path_requires_tpu():
    from glava_tpu.ops import autotune

    with pytest.raises(RuntimeError, match="TPU backend"):
        autotune.learn_path(1024, 3, streams=2, scan_len=2)


def test_rowwise_lookup_exact():
    """Per-row-table lookup (the column-aligned prev-fetch kernel) is
    bit-exact with the per-row jnp gather (interpret mode)."""
    from glava_tpu.ops.pallas.lookup import build_rowwise_lookup

    rng = np.random.default_rng(7)
    N, T, P = 21, 300, 260   # deliberately non-multiples of 8/128
    tabs = jnp.asarray(rng.standard_normal((N, T)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (N, P)), jnp.int32)
    lk = build_rowwise_lookup(N, T, P, interpret=True)
    out = np.asarray(lk(tabs, idx))
    want = np.take_along_axis(np.asarray(tabs), np.asarray(idx), axis=1)
    np.testing.assert_array_equal(out, want)


def test_table_lookup_exact():
    """The Pallas lane-shuffle lookup is bit-exact with the jnp gather
    (interpret mode; it replaces XLA's pathological per-pixel gather in
    the circle raster)."""
    from glava_tpu.ops.pallas.lookup import build_table_lookup

    rng = np.random.default_rng(5)
    T, L, P = 520, 3, 1000   # deliberately non-multiples of 128
    tab = jnp.asarray(rng.standard_normal(T).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, T, (L, P)), jnp.int32)
    lk = build_table_lookup(L, T, P, tile_rows=4, interpret=True)
    out = np.asarray(lk(tab, idx))
    want = np.asarray(tab)[np.asarray(idx)]
    np.testing.assert_array_equal(out, want)


@pytest.mark.parametrize("clamp", [True, False])
def test_ring_state_matches_shift_oracle(clamp):
    """The pipeline's ring-history state (one-slot writes, age-mapped
    weights) matches the shift-history formulation transcribed from the
    reference (transforms.fft_update) — including warmup, per-stream
    staggered clocks, and both GL_R16-clamp modes."""
    import jax

    from glava_tpu.config.state import RenderConfig
    from glava_tpu.pipeline import AudioPipeline

    n, F, S = 1024, 5, 3
    cfg = RenderConfig(bufsize=n, samplesize=256, avg_frames=F,
                       accel_fft=clamp, smooth_pass=False)
    uniforms = [
        UniformSpec("audio_l", "audio_l", ("window", "fft", "gravity", "avg")),
        UniformSpec("audio_r", "audio_r", ("window", "fft", "gravity", "avg")),
    ]
    pipe = AudioPipeline(cfg, uniforms, use_fused=False)
    w = jnp.asarray(windows.avg_weights(F, cfg.avg_window, clamp))

    rng = np.random.default_rng(9)
    st = pipe.init_state(batch=(S,))
    oracle = [transforms.chain_init(n, F, batch=(2,)) for _ in range(S)]
    want_tex = [None] * S
    for it in range(9):
        audio = jnp.asarray(
            rng.standard_normal((S, 2, n)).astype(np.float32) * 0.3
        )
        modified = jnp.asarray([(it % (s + 1)) == 0 for s in range(S)])
        adv = pipe.advance(st, audio[:, 0], audio[:, 1], gravity_g=0.05)
        st = pipe.select_updated(adv, st, modified)
        for s in range(S):
            if bool(modified[s]):
                oracle[s], want_tex[s] = transforms.fft_update(
                    oracle[s], audio[s], fft_scale=cfg.fft_scale,
                    fft_cutoff=cfg.fft_cutoff, gravity_g=0.05,
                    avg_weights=w, texture_clamp=clamp,
                )
    tex = pipe.textures_from(st, audio[:, 0], audio[:, 1])
    got = np.stack([np.asarray(tex["audio_l"]), np.asarray(tex["audio_r"])],
                   axis=1)   # (S, 2, n)
    for s in range(S):
        np.testing.assert_allclose(
            got[s], np.clip(np.asarray(want_tex[s]), 0.0, 1.0), atol=2e-6,
            err_msg=f"stream {s} (clamp={clamp})",
        )
