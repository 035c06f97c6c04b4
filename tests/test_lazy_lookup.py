"""Lazy static-fetch merging (branch-merged table lookups).

The interpreter defers full-plane smooth_audio fetches as _LazyFetch
values; masked assignment of two lazy fetches under a concrete mask
merges on the numpy index plane, so `if (idx > 0) v =
smooth_f(audio_l); else v = smooth_f(audio_r);` (radial/1.frag:74-75)
flushes as ONE combined-table Pallas lookup — the shape the native
modules build by hand (render/modules/circle.py `comb = i +
where(l, 0, sz)`). Values must be bit-identical to the eager path.
"""

import glob
import os
import shutil
from pathlib import Path

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

REF = "/root/reference/shaders/glava"

pytestmark = pytest.mark.skipif(
    not Path(REF).is_dir(), reason="reference shaders not present")


def _render(tmp_path, module, lazy, knobs="", seed=3, frames=4):
    sub = tmp_path / ("lazy" if lazy else "eager")
    mod = sub / module
    mod.mkdir(parents=True)
    for f in sorted(glob.glob(f"{REF}/{module}/*.frag")):
        shutil.copy(f, mod)
    (sub / "rc.glsl").write_text(
        f"#request mod {module}\n#request setgeometry 0 0 512 256\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n")
    if knobs:
        (sub / f"{module}.glsl").write_text(knobs)
    os.environ["GLAVA_TPU_LAZY_LK"] = "" if lazy else "0"
    try:
        lc = loader.load(user_dir=sub, system_dir=REF)
        r = Renderer(lc)
        state = r.init_state()
        step = jax.jit(r.step)
        rng = np.random.default_rng(seed)
        frame = None
        for _ in range(frames):
            snap = jnp.asarray(
                rng.standard_normal((2, 1024)).astype(np.float32) * 0.3)
            state, frame = step(state, snap, True, np.float32(0.1),
                                np.float32(1.0), np.float32(0.05), {})
        return np.asarray(frame)
    finally:
        os.environ.pop("GLAVA_TPU_LAZY_LK", None)


@pytest.mark.parametrize("module,knobs", [
    ("radial", "#define C_RADIUS 40\n#define NBARS 64\n"),
    ("circle", "#define C_RADIUS 40\n"),
])
def test_lazy_lookup_bit_exact(tmp_path, monkeypatch, module, knobs):
    monkeypatch.setenv("GLAVA_TPU_STATIC_LK", "interpret")
    a = _render(tmp_path, module, lazy=True, knobs=knobs)
    b = _render(tmp_path, module, lazy=False, knobs=knobs)
    assert (a[..., 3] > 0).any(), "nothing drawn"
    assert np.array_equal(a, b), (
        f"{module}: lazy-merged lookup diverges from eager "
        f"(max diff {np.abs(a - b).max()})")


def test_lazy_merge_builds_one_combined_lookup(tmp_path, monkeypatch):
    """The l/r branch fetch merges into a single lookup whose table is
    both textures plus const slots (> 2 * sz entries). Compaction is
    disabled here to observe the raw merged layout; the compacted form
    is pinned separately below."""
    from glava_tpu.config import glsl_shader
    from glava_tpu.config.glsl_shader import _STATIC_LK_CACHE

    monkeypatch.setenv("GLAVA_TPU_STATIC_LK", "interpret")
    monkeypatch.setattr(glsl_shader, "_COMPACT_LK_MAX", 0)
    _STATIC_LK_CACHE.clear()
    _render(tmp_path, "radial", lazy=True,
            knobs="#define C_RADIUS 40\n#define NBARS 64\n")
    sizes = [k[0] for k in _STATIC_LK_CACHE]
    assert any(s >= 2 * 1024 for s in sizes), (
        f"no combined-table lookup was built (table sizes: {sizes})")


def test_compact_reindex_builds_small_table(tmp_path, monkeypatch):
    """Few-valued merged fetches re-index through their unique values:
    radial's NBARS=64 fetch looks up a small compacted table, never
    the raw 2*sz+consts layout — and values are bit-identical to the
    uncompacted path."""
    from glava_tpu.config import glsl_shader
    from glava_tpu.config.glsl_shader import _STATIC_LK_CACHE

    monkeypatch.setenv("GLAVA_TPU_STATIC_LK", "interpret")
    knobs = "#define C_RADIUS 40\n#define NBARS 64\n"
    _STATIC_LK_CACHE.clear()
    a = _render(tmp_path, "radial", lazy=True, knobs=knobs)
    sizes = [k[0] for k in _STATIC_LK_CACHE]
    assert sizes and max(sizes) <= 4 * 66, (
        f"expected compacted tables only, got sizes {sizes}")
    monkeypatch.setattr(glsl_shader, "_COMPACT_LK_MAX", 0)
    b = _render((tmp_path / "raw"), "radial", lazy=True, knobs=knobs)
    np.testing.assert_array_equal(a, b)


def test_compact_static_fetch_unit():
    """_compact_static_fetch == table[idx] bit-exactly, in both the
    compacted and constant-plane regimes."""
    from glava_tpu.config.glsl_shader import _compact_static_fetch

    rng = np.random.default_rng(2)
    table = jnp.asarray(rng.standard_normal(4096).astype(np.float32))
    uvals = rng.choice(4096, 7, replace=False)
    idx = uvals[rng.integers(0, 7, (64, 1024))].astype(np.int64)
    got = np.asarray(_compact_static_fetch(table, idx, 4096))
    np.testing.assert_array_equal(got, np.asarray(table)[idx])
    const = np.full((8, 16), 123, np.int64)
    got_c = np.asarray(_compact_static_fetch(table, const, 4096))
    np.testing.assert_array_equal(got_c, np.asarray(table)[const])


def test_lazy_merge_unit_semantics():
    """Direct _lazy_merge semantics on small planes: table dedupe,
    const slots, nested merges — flush equals the eager select."""
    from glava_tpu.config.glsl_shader import (
        _LazyFetch, _lazy_merge,
    )

    rng = np.random.default_rng(0)
    h, w = 8, 16
    ta = jnp.asarray(rng.standard_normal(32).astype(np.float32))
    tb = jnp.asarray(rng.standard_normal(48).astype(np.float32))
    ia = rng.integers(0, 32, (h, w))
    ib = rng.integers(0, 48, (h, w))
    la = _LazyFetch([ta], [32], [], ia.astype(np.int64))
    lb = _LazyFetch([tb], [48], [], ib.astype(np.int64))
    m1 = rng.random((h, w)) < 0.5
    merged = _lazy_merge(m1, la, lb)
    assert merged is not None
    # nested: merge with a constant, then with a same-table fetch
    m2 = rng.random((h, w)) < 0.3
    merged2 = _lazy_merge(m2, merged, 0.25)
    assert merged2 is not None
    ia2 = rng.integers(0, 32, (h, w))
    la2 = _LazyFetch([ta], [32], [], ia2.astype(np.int64))
    m3 = rng.random((h, w)) < 0.4
    merged3 = _lazy_merge(m3, la2, merged2)
    assert merged3 is not None
    # table dedupe: ta appears once
    assert sum(1 for t in merged3.tables if t is ta) == 1
    got = np.asarray(merged3.flush())
    a_np, b_np = np.asarray(ta), np.asarray(tb)
    want = np.where(m1, a_np[ia], b_np[ib])
    want = np.where(m2, want, np.float32(0.25))
    want = np.where(m3, a_np[ia2], want)
    np.testing.assert_array_equal(got, want)


def test_lazy_merge_rejects_traced_mask():
    """A traced mask cannot stay lazy — merge returns None and the
    caller flushes."""
    from glava_tpu.config.glsl_shader import _LazyFetch, _lazy_merge

    ta = jnp.ones(16, jnp.float32)
    la = _LazyFetch([ta], [16], [], np.zeros((4, 4), np.int64))
    lb = _LazyFetch([ta], [16], [], np.ones((4, 4), np.int64))
    assert _lazy_merge(jnp.ones((4, 4), bool), la, lb) is None
    # and non-constant plane operands cannot fold either
    assert _lazy_merge(np.ones((4, 4), bool), la,
                       np.ones((4, 4), np.float32) * 2) is None


def test_lazy_merge_negative_zero_const_slot():
    """Const slot dedup must not alias -0.0 to 0.0 (list.index uses ==):
    the eager path preserves the sign bit, visible through 1/x."""
    from glava_tpu.config.glsl_shader import _LazyFetch, _lazy_merge

    ta = jnp.ones(16, jnp.float32)
    la = _LazyFetch([ta], [16], [], np.zeros((4, 4), np.int64))
    m1 = np.zeros((4, 4), bool)
    m1[0] = True
    with_pos = _lazy_merge(m1, la, 0.0)
    assert with_pos is not None
    m2 = np.zeros((4, 4), bool)
    m2[1] = True
    both = _lazy_merge(~m2, with_pos, -0.0)
    assert both is not None
    got = np.asarray(both.flush())
    assert np.signbit(got[1]).all(), "-0.0 const slot aliased to +0.0"
    assert not np.signbit(got[2:]).any()


def test_lazy_fetch_loud_consumption_guards():
    """np.asarray must not silently build an object array; bool() must
    raise like a traced plane; __getitem__ flushes."""
    from glava_tpu.config.glsl_shader import _LazyFetch

    ta = jnp.asarray(np.arange(8, dtype=np.float32))
    lz = _LazyFetch([ta], [8], [], np.full((2, 3), 4, np.int64))
    arr = np.asarray(lz)
    assert arr.dtype == np.float32 and arr.shape == (2, 3)
    np.testing.assert_array_equal(arr, 4.0)
    with pytest.raises(TypeError):
        bool(lz)
    np.testing.assert_array_equal(np.asarray(lz[0]), 4.0)
