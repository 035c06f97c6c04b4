"""The shipped system shader dir is SELF-SUFFICIENT for drop-in
community modules.

Every reference module (and the community modules that copy their
structure) includes ":util/smooth.glsl" and ":util/premultiply.frag"
from the SYSTEM shader root (e.g. radial/1.frag:9, radial/2.frag:1).
The reference installs those utils system-wide; glava_tpu must ship
its own (data/shaders/util/) so a user can drop a community module
into their config dir without also installing the reference's shader
tree. These tests pin that, and pin the shipped util files as
semantically identical to the reference's: a module rendered against
the shipped system dir is BIT-IDENTICAL to the same module rendered
against the reference's shader tree.
"""

from __future__ import annotations

import glob
import pathlib
import shutil

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.ops import smoothing
from glava_tpu.renderer import Renderer

REF = "/root/reference/shaders/glava"

pytestmark = pytest.mark.skipif(
    not pathlib.Path(REF).is_dir(),
    reason="reference shader tree not available",
)


def _render_dropin(tmp_path, module, system_dir, knobs="", frames=3):
    sub = tmp_path / ("sys" if system_dir is None else "ref")
    mod = sub / module
    mod.mkdir(parents=True)
    for f in sorted(glob.glob(f"{REF}/{module}/*.frag")):
        shutil.copy(f, mod)
    (sub / "rc.glsl").write_text(
        f"#request mod {module}\n#request setgeometry 0 0 256 144\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n")
    if knobs:
        (sub / f"{module}.glsl").write_text(knobs)
    kw = {} if system_dir is None else {"system_dir": system_dir}
    lc = loader.load(user_dir=sub, **kw)
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(7)
    snap = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32) * 0.3)
    frame = None
    for _ in range(frames):
        state, frame = step(state, snap, True, np.float32(0.1),
                            np.float32(1.0), np.float32(0.05), {})
    return np.asarray(frame)


@pytest.mark.parametrize("module,knobs", [
    ("bars", ""),
    ("radial", "#define C_RADIUS 30\n#define NBARS 64\n"),
    ("graph", ""),
    ("wave", ""),
    ("circle", "#define C_RADIUS 30\n"),
])
def test_dropin_module_without_reference_tree(tmp_path, module, knobs):
    """A reference module dropped into the user config dir renders
    against the DEFAULT (shipped) system dir, and the frame is
    bit-identical to rendering against the reference's own tree."""
    a = _render_dropin(tmp_path, module, None, knobs)
    assert (a[..., 3] > 0).any(), "nothing drawn against shipped utils"
    b = _render_dropin(tmp_path, module, REF, knobs)
    np.testing.assert_array_equal(a, b)


@pytest.mark.parametrize("mode,formula", [
    ("average", "sinusoidal"),
    ("maximum", "linear"),
])
def test_shipped_smooth_glsl_interpreted_matches_baked(
        tmp_path, monkeypatch, mode, formula):
    """GLAVA_TPU_INTERPRET_SMOOTH=1 executes the SHIPPED smooth.glsl
    loop (not the reference's); it must match the baked operator like
    the reference's copy does (tests/test_smooth_glsl_differential.py
    tolerances)."""
    monkeypatch.setenv("GLAVA_TPU_INTERPRET_SMOOTH", "1")
    SZ = 1024
    mod = tmp_path / "smoothdiff"
    mod.mkdir()
    (mod / "1.frag").write_text("""
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "audio_sz" audio_sz
uniform int audio_sz;
#request uniform "audio_l" audio_l
#request transform audio_l "window"
#request transform audio_l "fft"
#request transform audio_l "gravity"
#request transform audio_l "avg"
uniform sampler1D audio_l;
out vec4 fragment;
#include ":util/smooth.glsl"
void main() {
    float p = gl_FragCoord.x / screen.x;
    float raw = texelFetch(audio_l, int(gl_FragCoord.x), 0).r;
    fragment = vec4(smooth_audio(audio_l, audio_sz, p), raw, 0, 1);
}
""")
    (tmp_path / "rc.glsl").write_text(
        "#request mod smoothdiff\n"
        f"#request setgeometry 0 0 {SZ} 2\n"
        f"#request setbufsize {SZ}\n#request setsamplesize 256\n"
        "#request setprintframes false\n")
    (tmp_path / "smooth_parameters.glsl").write_text(
        f"#define SAMPLE_MODE {mode}\n#define ROUND_FORMULA {formula}\n"
        "#request setsmoothpass false\n")
    lc = loader.load(user_dir=tmp_path)          # DEFAULT system dir
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(11)
    snap = jnp.asarray(rng.standard_normal((2, SZ)).astype(np.float32) * 0.3)
    for _ in range(3):
        state, frame = step(state, snap, True, np.float32(0.0),
                            np.float32(1.0), np.float32(0.05), {})
    frame = np.asarray(frame)
    got, tex = frame[0, :, 0], frame[0, :, 1]
    cols = np.arange(SZ, dtype=np.float64)
    params = smoothing.SmoothParams(sample_mode=mode, round_formula=formula)
    op = smoothing.build_resample(SZ, (cols + 0.5) / SZ, params)
    want = np.asarray(op(jnp.asarray(tex)))
    diff = np.abs(got[8:] - want[8:])
    assert np.nanmax(diff) < 2e-3, f"max diff {np.nanmax(diff)}"
    assert np.percentile(diff, 95) < 2e-4, (
        f"p95 diff {np.percentile(diff, 95)} — systematic divergence")
