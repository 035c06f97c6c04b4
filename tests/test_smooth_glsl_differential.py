"""Differential parity: baked smoothing operator vs the reference's
OWN smooth.glsl, interpreted.

`ops/smoothing.build_resample` bakes smooth_audio
(/root/reference/shaders/glava/util/smooth.glsl:23-64) into static
operators from a TRANSCRIPTION of the loop. This suite closes that
trust gap the same way tests/test_refdsp_differential.py does for the
CPU transforms: with GLAVA_TPU_INTERPRET_SMOOTH=1 the interpreter
keeps the reference's ACTUAL GLSL smooth_audio definition (float-
stepped sampling loop, per-pixel spans) instead of the baked builtin,
executes it verbatim, and the result must match the operator at every
screen position for every sampling mode and weight formula.

Tolerances: the GLSL loop accumulates its sample position in float32
(`s += 1.0F`), while the operator tabulates spans/weights in float64 —
isolated columns may round a texel index differently when the
accumulated s lands within float noise of a .5 boundary. Semantic
errors (wrong span, wrong weight curve, wrong inclusivity) would move
MANY columns by large margins; float noise moves few columns by tiny
ones. Hence a per-column cap plus a tight 95th-percentile bound.
"""

from __future__ import annotations

import pathlib

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

SZ = 1024

FRAG = """
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
"""


@pytest.mark.parametrize("mode,formula", [
    ("average", "sinusoidal"),   # the shipped defaults
    ("average", "linear"),
    ("maximum", "sinusoidal"),
    ("hybrid", "circular"),
])
def test_interpreted_smooth_glsl_matches_baked_operator(
        tmp_path, monkeypatch, mode, formula):
    monkeypatch.setenv("GLAVA_TPU_INTERPRET_SMOOTH", "1")
    mod = tmp_path / "smoothdiff"
    mod.mkdir()
    (mod / "1.frag").write_text(FRAG)
    (tmp_path / "rc.glsl").write_text(
        "#request mod smoothdiff\n"
        f"#request setgeometry 0 0 {SZ} 2\n"
        f"#request setbufsize {SZ}\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    # the system smooth_parameters re-requests `setsmoothpass true`
    # during shader preprocessing (reference smooth_parameters.glsl:78
    # does the same), so the kernel-path override must live in the
    # USER smooth_parameters include, which is processed last
    (tmp_path / "smooth_parameters.glsl").write_text(
        f"#define SAMPLE_MODE {mode}\n#define ROUND_FORMULA {formula}\n"
        "#request setsmoothpass false\n"   # _PRE_SMOOTHED_AUDIO = 0
    )
    lc = loader.load(user_dir=tmp_path, system_dir=REF)
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(11)
    snap = jnp.asarray(rng.standard_normal((2, SZ)).astype(np.float32) * 0.3)
    for _ in range(3):
        state, frame = step(state, snap, True, np.float32(0.0),
                            np.float32(1.0), np.float32(0.05), {})
    frame = np.asarray(frame)
    got = frame[0, :, 0]
    tex = frame[0, :, 1]                       # raw texture, recovered

    cols = np.arange(SZ, dtype=np.float64)
    positions = (cols + 0.5) / SZ
    params = smoothing.SmoothParams(sample_mode=mode, round_formula=formula)
    op = smoothing.build_resample(SZ, positions, params)
    want = np.asarray(op(jnp.asarray(tex)))

    # skip the degenerate zero-span head (m == 0 -> 0/0 weight, NaN in
    # the raw GLSL; GPU clamp-of-NaN behavior is implementation-defined
    # and the operator's single-sample convention covers it)
    lo = 8
    diff = np.abs(got[lo:] - want[lo:])
    assert np.nanmax(diff) < 2e-3, f"max diff {np.nanmax(diff)}"
    assert np.percentile(diff, 95) < 2e-4, (
        f"p95 diff {np.percentile(diff, 95)} — systematic divergence"
    )
