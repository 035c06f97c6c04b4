"""Vectorized interpreter vs the per-pixel scalar oracle.

Each shader renders through the production masked-plane executor, then
the SAME parsed AST is re-executed at sampled pixels by
tests/scalar_oracle.ScalarExec with real Python control flow. The two
implementations share only the tokenizer/parser — execution (where the
masking bugs would live) is fully independent.

Includes the reference's own shipped shaders: bars and graph
(incl. the ANTI_ALIAS walk pass) are checked pixel-by-pixel against
the oracle at sampled locations.
"""

import glob
import shutil
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.render.base import PassInputs, as_planes, clip_planes, interleave
from glava_tpu.renderer import Renderer
from tests.scalar_oracle import ScalarExec

REF = "/root/reference/shaders/glava"


def _build(tmp_path, name, frags, screen=(48, 36), knobs=""):
    mod = tmp_path / name
    mod.mkdir(parents=True)
    for i, frag in enumerate(frags, 1):
        (mod / f"{i}.frag").write_text(frag)
    (tmp_path / "rc.glsl").write_text(
        f"#request mod {name}\n"
        f"#request setgeometry 0 0 {screen[0]} {screen[1]}\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    if knobs:
        (tmp_path / f"{name}.glsl").write_text(knobs)
    return loader.load(user_dir=tmp_path,
                       system_dir=REF if Path(REF).is_dir() else None)


def _frames_and_textures(lc):
    """Vectorized per-pass outputs + the texture dict they consumed."""
    r = Renderer(lc)
    rng = np.random.default_rng(5)
    snap = jnp.asarray(
        rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3)
    g = jnp.float32(lc.cfg.gravity_step / lc.cfg.nominal_ups)
    state = r.init_state()
    # advance the spectrum chains with real audio
    chains = r.pipeline.advance(state.chains, snap[0], snap[1], gravity_g=g)
    textures = r.pipeline.textures_from(chains, snap[0], snap[1])
    outs = []
    out = None
    w, h = r.screen
    for fn in r.module.passes:
        out = clip_planes(as_planes(fn(PassInputs(out, textures,
                                                  jnp.float32(0.1)))))
        outs.append(np.asarray(interleave(out, h, w)))
    tex_np = {k: np.asarray(v) for k, v in textures.items()}
    return r, outs, tex_np


def _check(lc, n_pixels=14, atol=2e-5, seed=3):
    r, outs, tex_np = _frames_and_textures(lc)
    w, h = lc.cfg.geometry[2], lc.cfg.geometry[3]
    rng = np.random.default_rng(seed)
    xs = rng.integers(0, w, n_pixels)
    ys = rng.integers(0, h, n_pixels)
    sz = tex_np[next(iter(tex_np))].shape[-1] if tex_np else lc.cfg.bufsize
    for pi, fn in enumerate(r.module.passes):
        program = fn.program
        prev = outs[pi - 1] if pi else None
        frame = outs[pi]
        for x, y in zip(xs, ys):
            ex = ScalarExec(program, x=int(x), y=int(y), textures=tex_np,
                            prev=prev, screen=(w, h), sz=sz,
                            defines=fn.defines, uniforms=fn.uniforms)
            got = np.clip(np.asarray(ex.run_main(), np.float64), 0.0, 1.0)
            want = frame[int(y), int(x)].astype(np.float64)
            assert np.allclose(got, want, atol=atol), (
                f"pass {pi + 1} pixel ({x},{y}): oracle {got} vs "
                f"vectorized {want}")


CONTROL_FRAG = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "audio_l" audio_l
#request transform audio_l "window"
#request transform audio_l "fft"
uniform sampler1D audio_l;
#request uniform "audio_sz" audio_sz
uniform int audio_sz;
out vec4 fragment;

struct Style { vec3 color; float boost; };

Style pick(float v) {
    if (v > 0.05) return Style(vec3(0.9, 0.3, 0.1), 2.0);
    return Style(vec3(0.1, 0.3, 0.9), 1.0);
}

void shade(inout float a, float f) { a *= f; }

void main() {
    float pos = gl_FragCoord.x / screen.x;
    float v = smooth_audio(audio_l, audio_sz, pos);
    Style s = pick(v);
    float acc = 0.0;
    float i = 0.0;
    while (i < 6.0) {
        switch (int(mod(i, 3.0))) {
        case 0: acc += v; break;
        case 1: acc += 0.01;       /* fallthrough */
        default: acc += 0.02;
        }
        i += 1.0;
        if (acc > 0.5) break;
    }
    float arr[3];
    arr[0] = v; arr[1] = acc; arr[2] = pos;
    float m = arr[int(mod(gl_FragCoord.y, 3.0))];
    shade(s.boost, clamp(0.5 + m, 0.5, 1.5));
    mat2 rot = mat2(0.8, 0.6, -0.6, 0.8);
    vec2 q = rot * vec2(pos, m);
    fragment = vec4(clamp(s.color * s.boost * 0.5, 0.0, 1.0),
                    clamp(q.x + q.y, 0.0, 1.0));
}
"""


def test_control_flow_composite_matches_oracle(tmp_path):
    lc = _build(tmp_path, "ctl", [CONTROL_FRAG])
    _check(lc)


WALK_FRAG_1 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "audio_l" audio_l
#request transform audio_l "window"
#request transform audio_l "fft"
uniform sampler1D audio_l;
#request uniform "audio_sz" audio_sz
uniform int audio_sz;
out vec4 fragment;
void main() {
    float v = smooth_audio(audio_l, audio_sz,
                           gl_FragCoord.x / screen.x) * 220.0;
    if (gl_FragCoord.y < v) fragment = vec4(0.8, 0.4, 0.2, 1.0);
    else fragment = vec4(0, 0, 0, 0);
}
"""

WALK_FRAG_2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

float up(float x, float oy) {
    float y = oy;
    while (y < screen.y) {
        vec4 f = texelFetch(tex, ivec2(x, y), 0);
        if (f.a <= 0) { y -= 1; break; }
        y += 1;
    }
    return y;
}

void main() {
    fragment = texelFetch(tex, ivec2(gl_FragCoord.x, gl_FragCoord.y), 0);
    if (fragment.a <= 0) {
        float h1 = up(gl_FragCoord.x - 1, 0.0);
        float h2 = up(gl_FragCoord.x + 1, 0.0);
        fragment = vec4(h1 / screen.y, h2 / screen.y, 0.0, 0.25);
    }
}
"""


def test_walk_pass_matches_oracle(tmp_path):
    lc = _build(tmp_path, "wk", [WALK_FRAG_1, WALK_FRAG_2])
    _check(lc)


@pytest.mark.skipif(not Path(REF).is_dir(),
                    reason="reference shader tree not available")
@pytest.mark.parametrize("module,knobs", [
    ("bars", ""),
    ("graph", "#define ANTI_ALIAS 1\n#define DRAW_HIGHLIGHT 0\n"),
    ("radial", "#define C_RADIUS 12\n#define NBARS 32\n"),
    ("wave", ""),
    ("circle", "#define C_RADIUS 12\n"),
])
def test_reference_shaders_match_oracle(tmp_path, module, knobs):
    """The reference's own shipped .frag files: vectorized executor vs
    the scalar oracle at sampled pixels."""
    mod = tmp_path / module
    mod.mkdir()
    for f in sorted(glob.glob(f"{REF}/{module}/*.frag")):
        shutil.copy(f, mod)
    (tmp_path / "rc.glsl").write_text(
        f"#request mod {module}\n#request setgeometry 0 0 64 48\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    if knobs:
        (tmp_path / f"{module}.glsl").write_text(knobs)
    lc = loader.load(user_dir=tmp_path, system_dir=REF)
    # boundary pixels can legitimately differ by one f32 ulp crossing a
    # threshold (f64 oracle); tolerate a tiny number of mismatches
    r, outs, tex_np = _frames_and_textures(lc)
    w, h = 64, 48
    rng = np.random.default_rng(9)
    xs = rng.integers(1, w - 1, 20)
    ys = rng.integers(1, h - 1, 20)
    sz = tex_np[next(iter(tex_np))].shape[-1]
    bad = 0
    for pi, fn in enumerate(r.module.passes):
        prev = outs[pi - 1] if pi else None
        for x, y in zip(xs, ys):
            ex = ScalarExec(fn.program, x=int(x), y=int(y),
                            textures=tex_np, prev=prev, screen=(w, h),
                            sz=sz, defines=fn.defines,
                            uniforms=fn.uniforms)
            got = np.clip(np.asarray(ex.run_main(), np.float64), 0.0, 1.0)
            want = outs[pi][int(y), int(x)].astype(np.float64)
            if not np.allclose(got, want, atol=5e-4):
                bad += 1
    total = len(r.module.passes) * len(xs)
    assert bad <= total * 0.05, f"{bad}/{total} sampled pixels diverge"


def test_rings_example_matches_oracle(tmp_path):
    """The shipped community-style example module (docs/examples/rings)
    through the oracle differential: structs, bit-hash dither, mat2,
    geometric builtins and normalized-coord texture() smearing per
    pixel with REAL control flow vs the vectorized executor."""
    ex = Path(__file__).resolve().parent.parent / "docs/examples/rings"
    lc = _build(tmp_path, "rings",
                [(ex / "1.frag").read_text(), (ex / "2.frag").read_text()],
                screen=(48, 36))
    _check(lc)
