"""GLSL subset interpreter: drop-in user .frag modules."""

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

EQ_FRAG = """
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

#define AMPLIFY 250
#define BASE @fg:#22aa66

void main() {
    float pos = gl_FragCoord.x / screen.x;
    float v = smooth_audio(audio_l, audio_sz, pos) * AMPLIFY;
    if (gl_FragCoord.y < v) {
        float t = clamp(gl_FragCoord.y / v, 0.0, 1.0);
        fragment = vec4(BASE.rgb * (1.0 - 0.5 * t), 1.0);
        return;
    }
    fragment = vec4(0, 0, 0, 0);
}
"""

DIM_FRAG = """
in vec4 gl_FragCoord;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;
#define DIM 1
#include ":eq.glsl"
void main() {
    fragment = texelFetch(tex, ivec2(gl_FragCoord.x, gl_FragCoord.y), 0);
    #if DIM == 1
    fragment.rgb *= 0.8;
    #endif
}
"""


def _setup(tmp_path, frag2=DIM_FRAG, knobs=None):
    mod = tmp_path / "eq"
    mod.mkdir()
    (mod / "1.frag").write_text(EQ_FRAG)
    if frag2:
        (mod / "2.frag").write_text(frag2)
    (tmp_path / "rc.glsl").write_text(
        "#request mod eq\n#request setgeometry 0 0 128 96\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    if knobs:
        (tmp_path / "eq.glsl").write_text(knobs)
    return loader.load(user_dir=tmp_path)


def _render(lc, n=8):
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3
    )
    for _ in range(n):
        state, frame = step(state, snap, True, np.float32(0.0),
                            np.float32(1.0), np.float32(0.05), {})
    return np.asarray(frame)


def test_custom_frag_module_end_to_end(tmp_path):
    lc = _setup(tmp_path)
    assert lc.module == "eq"
    f = _render(lc)
    drawn = f[f[..., 3] > 0]
    assert drawn.size
    # pass 2 dims the base green 0xaa/255 by 0.8
    assert abs(drawn[:, 1].max() - 0.8 * (0xAA / 255)) < 2e-3


def test_knob_if_disables_second_pass(tmp_path):
    lc = _setup(tmp_path, knobs="#define DIM 0\n")
    f = _render(lc)
    drawn = f[f[..., 3] > 0]
    assert drawn.size
    # no dim pass effect... DIM 0 keeps the #if block out
    assert abs(drawn[:, 1].max() - (0xAA / 255)) < 2e-3


def test_disablestage_skips_pass(tmp_path):
    frag2 = "#if 1\n#error __disablestage\n#endif\n" + DIM_FRAG
    lc = _setup(tmp_path, frag2=frag2)
    f = _render(lc)
    drawn = f[f[..., 3] > 0]
    assert drawn.size
    assert abs(drawn[:, 1].max() - (0xAA / 255)) < 2e-3  # undimmed


def test_pipe_bind_in_shader(tmp_path):
    lc = _setup(tmp_path, frag2=None)
    lc.env.pipe_values["fg"] = (1.0, 0.0, 0.0, 1.0)
    f = _render(lc)
    drawn = f[f[..., 3] > 0]
    assert drawn.size
    assert drawn[:, 0].max() > 0.9 and drawn[:, 1].max() < 1e-6  # pure red


def test_while_loop_masked_iteration(tmp_path):
    """Data-dependent `while` loops run per pixel (lax.while_loop with
    retirement masking) — the construct graph/3.frag's anti-alias
    column walk needs."""
    mod = tmp_path / "wl"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  float acc = 0.0;\n"
        "  float i = 0.0;\n"
        "  while (i < gl_FragCoord.x) {\n"
        "    acc += 2.0;\n"
        "    i += 1.0;\n"
        "    if (acc > 10.0) break;\n"
        "  }\n"
        "  fragment = vec4(acc / 16.0, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod wl\n#request setgeometry 0 0 8 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    want = np.minimum(2.0 * (np.arange(8) + 1), 12.0) / 16.0
    np.testing.assert_allclose(f[0, :, 0], want, atol=1e-6)


def test_arrays_and_do_while(tmp_path):
    """Fixed-size arrays (decl, constructor, dynamic index) and
    do-while — common community-shader constructs."""
    mod = tmp_path / "arr"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  float a[3];\n"
        "  a[0] = 1.0; a[1] = 2.0; a[2] = 4.0;\n"
        "  float b[] = float[](0.125, 0.25, 0.5);\n"
        "  float idx = mod(gl_FragCoord.x - 0.5, 3.0);\n"
        "  float n = 0.0;\n"
        "  do { n += 1.0; } while (n < a[idx]);\n"
        "  fragment = vec4(a[idx] / 8.0, b[int(idx)], n / 8.0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod arr\n#request setgeometry 0 0 6 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    np.testing.assert_allclose(f[0, :, 0], [1, 2, 4, 1, 2, 4] / np.float32(8),
                               atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], [0.125, 0.25, 0.5] * 2, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 2], [1, 2, 4, 1, 2, 4] / np.float32(8),
                               atol=1e-6)


def test_shader_shadowing_builtin(tmp_path):
    """A user `bars/1.frag` shadows the built-in bars module
    (user-over-system path order, render.c:1327-1350)."""
    mod = tmp_path / "bars"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "out vec4 fragment;\nvoid main() { fragment = vec4(0, 0, 1, 1); }\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod bars\n#request setgeometry 0 0 16 16\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=2)
    np.testing.assert_allclose(f[..., 2], 1.0)  # all blue


REF = "/root/reference/shaders/glava"


@pytest.mark.skipif(not __import__("pathlib").Path(REF).is_dir(),
                    reason="reference shader tree not available")
def test_reference_wave_shaders_verbatim(tmp_path):
    """The reference's own wave/1.frag + wave/2.frag (function-like
    `index()` macro, texture() REPEAT sampling, neighborhood outline)
    run unmodified through the interpreter and match our native wave
    module pixel-for-pixel."""
    import shutil

    mod = tmp_path / "wave"
    mod.mkdir()
    shutil.copy(f"{REF}/wave/1.frag", mod / "1.frag")
    shutil.copy(f"{REF}/wave/2.frag", mod / "2.frag")
    (tmp_path / "rc.glsl").write_text(
        "#request mod wave\n#request setgeometry 0 0 192 128\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc_i = loader.load(user_dir=tmp_path, system_dir=REF)
    assert "wave" in lc_i.module_overrides
    lc_n = loader.load(
        cli_requests=("setgeometry 0 0 192 128", "setbufsize 1024",
                      "setsamplesize 256", "setprintframes false"),
        force_module="wave",
    )
    ri, rn = Renderer(lc_i), Renderer(lc_n)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32) * 0.3)
    si, sn = ri.init_state(), rn.init_state()
    fi, fn = ri.jit_step(), rn.jit_step()
    for _ in range(4):
        si, frame_i = fi(si, snap, True, np.float32(0.0), np.float32(1.0),
                         np.float32(0.05), {})
        sn, frame_n = fn(sn, snap, True, np.float32(0.0), np.float32(1.0),
                         np.float32(0.05), {})
    a, b = np.asarray(frame_i), np.asarray(frame_n)
    assert (a[..., 3] > 0).mean() > 0.3  # real content
    np.testing.assert_allclose(a, b, atol=1e-6)


@pytest.mark.skipif(not __import__("pathlib").Path(REF).is_dir(),
                    reason="reference shader tree not available")
def test_reference_bars_shaders_verbatim(tmp_path):
    """The reference's own bars/1.frag + bars/2.frag (includes of
    @bars.glsl/util/smooth.glsl, smooth_f() macro, channel split,
    outline logic) run unmodified and match our native bars module
    exactly."""
    import shutil

    mod = tmp_path / "bars"
    mod.mkdir()
    shutil.copy(f"{REF}/bars/1.frag", mod / "1.frag")
    shutil.copy(f"{REF}/bars/2.frag", mod / "2.frag")
    (tmp_path / "rc.glsl").write_text(
        "#request mod bars\n#request setgeometry 0 0 192 128\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc_i = loader.load(user_dir=tmp_path, system_dir=REF)
    assert "bars" in lc_i.module_overrides
    lc_n = loader.load(
        cli_requests=("setgeometry 0 0 192 128", "setbufsize 1024",
                      "setsamplesize 256", "setprintframes false"),
        force_module="bars", system_dir=REF,
    )
    ri, rn = Renderer(lc_i), Renderer(lc_n)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32) * 0.3)
    si, sn = ri.init_state(), rn.init_state()
    fi, fn = ri.jit_step(), rn.jit_step()
    for _ in range(6):
        si, frame_i = fi(si, snap, True, np.float32(0.0), np.float32(1.0),
                         np.float32(0.05), {})
        sn, frame_n = fn(sn, snap, True, np.float32(0.0), np.float32(1.0),
                         np.float32(0.05), {})
    a, b = np.asarray(frame_i), np.asarray(frame_n)
    assert (a[..., 3] > 0).mean() > 0.1
    np.testing.assert_allclose(a, b, atol=1e-6)


def _compare_verbatim(tmp_path, module, screen, nframes=5, knobs=""):
    import glob
    import shutil

    mod = tmp_path / module
    mod.mkdir()
    for f in sorted(glob.glob(f"{REF}/{module}/*.frag")):
        shutil.copy(f, mod)
    rc = (
        f"#request mod {module}\n"
        f"#request setgeometry 0 0 {screen[0]} {screen[1]}\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    (tmp_path / "rc.glsl").write_text(rc)
    # knob overrides ride the user `<module>.glsl` (the reference's
    # `:module.glsl` include), applied to BOTH programs; the native one
    # gets a user dir without the shader directory so it isn't shadowed
    native_dir = tmp_path / "native_cfg"
    native_dir.mkdir()
    (native_dir / "rc.glsl").write_text(rc)
    if knobs:
        (tmp_path / f"{module}.glsl").write_text(knobs)
        (native_dir / f"{module}.glsl").write_text(knobs)
    lc_i = loader.load(user_dir=tmp_path, system_dir=REF)
    lc_n = loader.load(user_dir=native_dir, system_dir=REF)
    ri, rn = Renderer(lc_i), Renderer(lc_n)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32) * 0.3)
    si, sn = ri.init_state(), rn.init_state()
    fi, fn = ri.jit_step(), rn.jit_step()
    for _ in range(nframes):
        si, a = fi(si, snap, True, np.float32(0.0), np.float32(1.0),
                   np.float32(0.05), {})
        sn, b = fn(sn, snap, True, np.float32(0.0), np.float32(1.0),
                   np.float32(0.05), {})
    return np.asarray(a), np.asarray(b)


@pytest.mark.skipif(not __import__("pathlib").Path(REF).is_dir(),
                    reason="reference shader tree not available")
@pytest.mark.parametrize("module,screen,px_tol,knobs", [
    ("radial", (300, 300), 0.0, ""),   # user functions via macros: exact
    ("circle", (300, 300), 0.001, ""),  # f32-vs-f64 boundary rounding
    ("graph", (192, 128), 0.02, ""),
    # graph's optional pass 3 (per-column while-loop walk,
    # graph/3.frag:24-54) runs verbatim via the masked lax.while_loop
    ("graph", (192, 128), 0.02, "#define ANTI_ALIAS 1\n"),
])
def test_reference_modules_verbatim(tmp_path, module, screen, px_tol, knobs):
    """Every remaining reference module (radial's APPLY_FRAG
    assignment-macros, circle/graph helper functions and file-scope
    globals) runs unmodified through the interpreter. Tolerances cover
    f32-traced vs f64-precomputed edge rounding at bar/slope
    boundaries."""
    a, b = _compare_verbatim(tmp_path, module, screen, knobs=knobs)
    assert (a[..., 3] > 0).any()
    assert abs((a[..., 3] > 0).mean() - (b[..., 3] > 0).mean()) < 2e-3
    frac = (np.abs(a - b).max(axis=-1) > 1 / 255).mean()
    assert frac <= px_tol, f"{frac:.4%} pixels deviate"
    if "ANTI_ALIAS 1" in knobs:
        # the AA pass must actually have run: feathered edge pixels
        assert ((a[..., 3] > 0) & (a[..., 3] < 0.99)).mean() > 0.005


def test_discard(tmp_path):
    mod = tmp_path / "disc"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        '#request uniform "screen" screen\n'
        "uniform ivec2 screen;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  if (gl_FragCoord.x < screen.x / 2) discard;\n"
        "  fragment = vec4(1, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod disc\n#request setgeometry 0 0 32 16\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=2)
    assert (f[:, :16, 3] == 0).all()   # discarded left half
    assert (f[:, 16:, 0] == 1).all()   # red right half


def test_static_for_loop_unrolls(tmp_path):
    """Counted loops with knob bounds unroll (community glow-shader
    pattern)."""
    mod = tmp_path / "glow"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        '#request uniform "screen" screen\n'
        "uniform ivec2 screen;\n"
        "out vec4 fragment;\n"
        "#define TAPS 4\n"
        "void main() {\n"
        "  float acc = 0.0;\n"
        "  for (int i = 0; i < TAPS; i++) {\n"
        "    acc += 0.25;\n"
        "  }\n"
        "  fragment = vec4(acc, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod glow\n#request setgeometry 0 0 8 8\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    np.testing.assert_allclose(f[..., 0], 1.0, atol=1e-6)


def test_for_loop_dynamic_bound_lowers_to_while(tmp_path):
    """`for` with a per-pixel bound lowers to the masked while loop."""
    mod = tmp_path / "dynfor"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  float acc = 0.0;\n"
        "  for (int i = 0; i < gl_FragCoord.x; i++) { acc += 0.125; }\n"
        "  fragment = vec4(acc, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod dynfor\n#request setgeometry 0 0 8 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    np.testing.assert_allclose(f[0, :, 0], 0.125 * (np.arange(8) + 1),
                               atol=1e-6)


def test_helper_function_early_returns(tmp_path):
    """Early value-returns in helpers merge per pixel."""
    mod = tmp_path / "er"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        '#request uniform "screen" screen\n'
        "uniform ivec2 screen;\n"
        "out vec4 fragment;\n"
        "float pick(float x) {\n"
        "  if (x < 8.0) {\n"
        "    return 0.25;\n"
        "  }\n"
        "  if (x < 16.0) return 0.5;\n"
        "  return 1.0;\n"
        "}\n"
        "void main() {\n"
        "  float v = pick(gl_FragCoord.x);\n"
        "  fragment = vec4(v, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod er\n#request setgeometry 0 0 24 4\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    np.testing.assert_allclose(f[:, :8, 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(f[:, 8:16, 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(f[:, 16:, 0], 1.0, atol=1e-6)


@pytest.mark.skipif(not __import__("pathlib").Path(REF).is_dir(),
                    reason="reference shader tree not available")
def test_reference_test_module_verbatim_golden(tmp_path):
    """The reference's own CI fixture (test_rc.glsl + test/{1,2,3}.frag)
    runs verbatim through the interpreter and passes its settesteval
    golden assertion."""
    import glob
    import shutil

    mod = tmp_path / "test"
    mod.mkdir()
    for f in glob.glob(f"{REF}/test/*.frag"):
        shutil.copy(f, mod)
    lc = loader.load(entry="test_rc.glsl", user_dir=tmp_path, system_dir=REF)
    assert "test" in lc.module_overrides
    r = Renderer(lc, screen=(48, 48))
    state = r.init_state()
    step = r.jit_step()
    snap = jnp.zeros((2, lc.cfg.bufsize), jnp.float32)
    _, frame = step(state, snap, True, np.float32(0.0), np.float32(1.0),
                    np.float32(0.05), {})
    assert r.test_evaluate(frame)


def test_continue_in_dynamic_for_advances_counter(tmp_path):
    """`continue` must still run the loop increment (C/GLSL semantics)
    — the increment rides the while-lowering's epilogue."""
    mod = tmp_path / "cdf"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  float q = 0.0;\n"
        "  float n = gl_FragCoord.y - 0.5 + 3.0;\n"
        "  for (int i = 0; i < n; i += 1) {\n"
        "    if (i == 1) continue;\n"
        "    q += 0.1;\n"
        "  }\n"
        "  fragment = vec4(q, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod cdf\n#request setgeometry 0 0 4 5\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    # row y: n = y+3 iterations, one continued -> q = 0.1*(y+2)
    want = 0.1 * (np.arange(5) + 2)
    np.testing.assert_allclose(f[:, 0, 0], want, atol=1e-6)


def test_continue_in_do_while_checks_condition(tmp_path):
    """GLSL `continue` in do-while jumps to the condition check."""
    mod = tmp_path / "cdw"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "out vec4 fragment;\n"
        "void main() {\n"
        "  float k = 0.0;\n"
        "  float z = 0.0;\n"
        "  do {\n"
        "    k += 1.0;\n"
        "    if (k == 2.0) continue;\n"
        "    z += 1.0;\n"
        "  } while (k < 2.0);\n"
        "  fragment = vec4(k / 8.0, z / 8.0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod cdw\n#request setgeometry 0 0 4 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    np.testing.assert_allclose(f[..., 0], 2.0 / 8.0, atol=1e-6)  # k == 2
    np.testing.assert_allclose(f[..., 1], 1.0 / 8.0, atol=1e-6)  # z == 1


def test_global_write_through_function_in_while(tmp_path):
    """A helper mutating a global inside a while body must ride the
    loop carry (previously escaped the trace -> UnexpectedTracerError)."""
    mod = tmp_path / "gfn"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "float g = 0.0;\n"
        "void bump() { g += 0.125; }\n"
        "void main() {\n"
        "  float j = 0.0;\n"
        "  while (j < gl_FragCoord.x) {\n"
        "    j += 1.0;\n"
        "    bump();\n"
        "  }\n"
        "  fragment = vec4(g, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod gfn\n#request setgeometry 0 0 6 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    want = 0.125 * (np.arange(6) + 1)   # ceil(x) bumps per pixel
    np.testing.assert_allclose(f[0, :, 0], want, atol=1e-6)


def test_global_write_through_function_in_while_condition(tmp_path):
    """A helper mutating a global called from the while CONDITION must
    also ride the loop carry (the condition re-evaluates inside the
    traced loop body)."""
    mod = tmp_path / "gcond"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "float g = 0.0;\n"
        "float nextv() { g += 1.0; return g; }\n"
        "void main() {\n"
        "  while (nextv() < gl_FragCoord.x) { }\n"
        "  fragment = vec4(g / 8.0, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod gcond\n#request setgeometry 0 0 6 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    # pixel x: loop runs until nextv() >= x; g ends at ceil(x) = col+1
    want = (np.arange(6) + 1) / 8.0
    np.testing.assert_allclose(f[0, :, 0], want, atol=1e-6)


def test_prev_fetch_shift_fast_path_matches_gather(tmp_path):
    """The constant-shift texelFetch(prev) fast path equals the gather
    semantics for every offset class: identity, +/-1 neighbor taps,
    large offsets, and whole-frame out-of-range — including the
    truncate-toward-zero clamp of negative float coordinates and the
    `int(gl_FragCoord.x)` idiom (numpy-preserving builtins)."""
    import itertools

    import jax.numpy as jnp

    from glava_tpu.config import glsl_expr
    from glava_tpu.config.glsl_shader import _Exec, make_builtins, parse_shader

    h, w = 7, 11
    rng = np.random.default_rng(21)
    prev = jnp.asarray(rng.random((h, w, 4)).astype(np.float32))
    prev_planes = tuple(prev[..., c] for c in range(4))
    xs = (np.arange(w) + 0.5).astype(np.float32)[None, :]
    ys = (np.arange(h) + 0.5).astype(np.float32)[:, None]

    def run(dx, dy, use_int):
        coord = ("int(gl_FragCoord.x) + ({dx}), int(gl_FragCoord.y) + ({dy})"
                 if use_int else
                 "gl_FragCoord.x + ({dx}), gl_FragCoord.y + ({dy})"
                 ).format(dx=dx, dy=dy)
        src = ("void main() { fragment = texelFetch(tex, ivec2(%s), 0); }"
               % coord)
        prog = parse_shader(src)
        env = glsl_expr.Env(variables={
            "gl_FragCoord": (xs, ys, 0.0, 1.0),
            "tex": "prev",
            "fragment": (0.0, 0.0, 0.0, 0.0),
        })
        env.functions.update(make_builtins(prev_planes, 16, h, w, None))
        ex = _Exec(env, h, w)
        ex.run(prog.body)
        return np.asarray(glsl_expr.to_rgba(env.variables["fragment"]))

    def oracle(dx, dy, use_int):
        # reference semantics: truncate-toward-zero int cast, then
        # robust texelFetch (OOB -> transparent black)
        if use_int:
            xi = np.trunc(np.trunc(xs) + dx).astype(np.int64)
            yi = np.trunc(np.trunc(ys) + dy).astype(np.int64)
        else:
            xi = np.trunc(xs + dx).astype(np.int64)
            yi = np.trunc(ys + dy).astype(np.int64)
        xi = np.broadcast_to(xi, (h, w))
        yi = np.broadcast_to(yi, (h, w))
        inside = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
        out = np.asarray(prev)[np.clip(yi, 0, h - 1), np.clip(xi, 0, w - 1)]
        return np.where(inside[..., None], out, 0.0)

    offs = (-(w + 3), -h, -2, -1, 0, 1, 2, h, w + 3)
    for dx, dy in itertools.product(offs, repeat=2):
        for use_int in (False, True):
            got = run(dx, dy, use_int)
            want = oracle(dx, dy, use_int)
            np.testing.assert_array_equal(
                got, want, err_msg=f"dx={dx} dy={dy} int={use_int}"
            )


def test_return_inside_while_retires_pixels(tmp_path):
    """`return` lexically inside a data-dependent while loop (the
    graph-AA-walk-with-early-exit shape, cf. graph/3.frag) retires
    pixels for the remainder of main — writes after the loop must not
    touch returned pixels."""
    mod = tmp_path / "rw"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  fragment = vec4(0, 0, 0, 1);\n"
        "  float i = 0.0;\n"
        "  while (i < gl_FragCoord.x) {\n"
        "    i += 1.0;\n"
        "    if (i >= 3.0) {\n"
        "      fragment = vec4(1, 0, 0, 1);\n"
        "      return;\n"  # pixels with x >= 3 exit main here
        "    }\n"
        "  }\n"
        "  fragment = vec4(0, 1, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod rw\n#request setgeometry 0 0 8 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    # gl_FragCoord.x = col + 0.5: col c iterates i = 1..c+1, so the
    # in-loop return (i >= 3) fires for cols >= 2 (red); cols 0-1
    # finish the loop (green)
    np.testing.assert_allclose(f[0, :2, 1], 1.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :2, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(f[0, 2:, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(f[0, 2:, 1], 0.0, atol=1e-6)


def test_valued_return_inside_while_in_helper(tmp_path):
    """A helper function whose per-pixel return VALUE is produced
    inside a data-dependent loop: the merged value rides the loop
    carry (walk-until-threshold returning the step count)."""
    mod = tmp_path / "rv"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "float walk(float limit) {\n"
        "  float i = 0.0;\n"
        "  while (i < 100.0) {\n"
        "    i += 1.0;\n"
        "    if (i >= limit) return i * 0.1;\n"
        "  }\n"
        "  return 9.9;\n"
        "}\n"
        "void main() {\n"
        "  fragment = vec4(walk(gl_FragCoord.x), 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod rv\n#request setgeometry 0 0 6 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    # limit = col + 0.5 -> first i >= limit is ceil(limit) = col + 1
    want = (np.arange(6) + 1) * 0.1
    np.testing.assert_allclose(f[0, :, 0], want, atol=1e-6)


def test_return_inside_nested_while_chains_outward(tmp_path):
    """Retirement from a return in an INNER loop propagates through the
    outer loop and to post-loop code (same function depth chaining)."""
    mod = tmp_path / "rn"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  fragment = vec4(0, 0, 0, 1);\n"
        "  float o = 0.0;\n"
        "  while (o < gl_FragCoord.x) {\n"
        "    float i = 0.0;\n"
        "    while (i < gl_FragCoord.y) {\n"
        "      i += 1.0;\n"
        "      if (o + i >= 4.0) { fragment.r = 1.0; return; }\n"
        "    }\n"
        "    o += 1.0;\n"
        "  }\n"
        "  fragment.g = 1.0;\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod rn\n#request setgeometry 0 0 6 4\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    # brute-force the same walk in python
    for row in range(4):
        for col in range(6):
            x, y = col + 0.5, row + 0.5
            o = 0.0
            returned = False
            while o < x and not returned:
                i = 0.0
                while i < y:
                    i += 1.0
                    if o + i >= 4.0:
                        returned = True
                        break
                o += 0.0 if returned else 1.0
            want = (1.0, 0.0) if returned else (0.0, 1.0)
            got = (f[row, col, 0], f[row, col, 1])
            assert got == pytest.approx(want), (row, col)


def test_fuel_exhaustion_warns_and_strict_raises(tmp_path, monkeypatch, capfd):
    """An infinite per-pixel loop retires at the fuel cap with a LOUD
    one-line warning (count of truncated pixels); under
    GLAVA_TPU_WHILE_FUEL_STRICT=1 it raises instead."""
    mod = tmp_path / "fuel"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  float i = 0.0;\n"
        "  while (i >= 0.0) { i += 1.0; }\n"
        "  fragment = vec4(i * 0.1, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod fuel\n#request setgeometry 0 0 4 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    from glava_tpu.config import glsl_shader

    monkeypatch.setenv("GLAVA_TPU_WHILE_FUEL", "7")
    monkeypatch.setitem(glsl_shader._FUEL_WARN_STATE, "last", 0.0)
    lc = loader.load(user_dir=tmp_path)
    import jax

    f = _render(lc, n=1)
    jax.effects_barrier()  # flush the debug callback
    err = capfd.readouterr().err
    assert "fuel cap (7) exhausted with 8 pixel(s)" in err
    np.testing.assert_allclose(f[0, :, 0], 0.7, atol=0.01)  # truncated value

    monkeypatch.setenv("GLAVA_TPU_WHILE_FUEL_STRICT", "1")
    lc2 = loader.load(user_dir=tmp_path)
    with pytest.raises(Exception, match="fuel cap"):
        _render(lc2, n=1)
        jax.effects_barrier()


def test_graph_aa_verbatim_through_col_lookup(tmp_path, monkeypatch):
    """The graph ANTI_ALIAS walk's column-aligned prev fetches route
    through the Pallas row-wise lookup (forced in interpret mode here)
    and still match the native module pixel-for-pixel."""
    monkeypatch.setenv("GLAVA_TPU_COL_LOOKUP", "interpret")
    a, b = _compare_verbatim(tmp_path, "graph", (192, 128),
                             knobs="#define ANTI_ALIAS 1\n")
    assert (a[..., 3] > 0).any()
    frac = (np.abs(a - b).max(axis=-1) > 1 / 255).mean()
    assert frac <= 0.02, f"{frac:.4%} pixels deviate"
    assert ((a[..., 3] > 0) & (a[..., 3] < 0.99)).mean() > 0.005


SWITCH_FRAG = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
out vec4 fragment;

void main() {
    int band = int(gl_FragCoord.x) % 5;
    float r = 0; float g = 0; float b = 0;
    switch (band) {
    case 0:
        r = 1.0;
        break;
    case 1:
    case 2:
        g = 0.5;           /* falls through from 1 AND 2 */
        if (band == 2) { break; }
        g = 1.0;           /* only band 1 reaches this */
        break;
    case 3:
        b = 0.25;          /* falls through into default */
    default:
        b += 0.5;
    }
    fragment = vec4(r, g, b, 1.0);
}
"""


def test_switch_fallthrough_and_masked_break(tmp_path):
    """GLSL switch: per-pixel selector, C fallthrough, conditional
    (masked) break, shared case labels, default catching unmatched."""
    mod = tmp_path / "sw"
    mod.mkdir()
    (mod / "1.frag").write_text(SWITCH_FRAG)
    (tmp_path / "rc.glsl").write_text(
        "#request mod sw\n#request setgeometry 0 0 20 4\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    band = np.arange(20) % 5
    want_r = np.where(band == 0, 1.0, 0.0)
    want_g = np.where(band == 1, 1.0, np.where(band == 2, 0.5, 0.0))
    want_b = np.where(band == 3, 0.75, np.where(band == 4, 0.5, 0.0))
    np.testing.assert_allclose(f[0, :, 0], want_r, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], want_g, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 2], want_b, atol=1e-6)


def test_switch_continue_targets_enclosing_loop(tmp_path):
    """`continue` inside a switch inside a loop binds to the LOOP."""
    mod = tmp_path / "swc"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "    float acc = 0;\n"
        "    for (int i = 0; i < 6; i += 1) {\n"
        "        switch (i % 3) {\n"
        "        case 0: continue;\n"
        "        case 1: acc += 1.0; break;\n"
        "        default: acc += 10.0;\n"
        "        }\n"
        "        acc += 100.0;\n"
        "    }\n"
        "    fragment = vec4(acc / 1000.0, 0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod swc\n#request setgeometry 0 0 8 4\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    # i=0,3: continue (skip +100); i=1,4: +1+100; i=2,5: +10+100
    want = (2 * (1 + 100) + 2 * (10 + 100)) / 1000.0
    np.testing.assert_allclose(f[..., 0], want, atol=1e-6)


def test_switch_write_rides_while_carry(tmp_path):
    """A variable assigned ONLY inside a switch nested in a
    data-dependent while loop must ride the loop carry
    (_collect_writes walks switch case bodies)."""
    mod = tmp_path / "swl"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "    float acc = 0.0;\n"
        "    float i = 0.0;\n"
        "    float limit = gl_FragCoord.x + 0.5;\n"
        "    while (i < limit) {\n"
        "        switch (int(mod(i, 2.0))) {\n"
        "        case 0: acc += 1.0; break;\n"
        "        default: acc += 10.0;\n"
        "        }\n"
        "        i += 1.0;\n"
        "    }\n"
        "    fragment = vec4(acc / 100.0, i / 100.0, 0, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod swl\n#request setgeometry 0 0 6 2\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    x = np.arange(6)
    iters = x + 1  # while (i < x + 0.5) runs x+1 times from i=0... no:
    # i goes 0..ceil(limit)-1; limit = x+0.5 -> iterations = x+1
    evens = (iters + 1) // 2       # i = 0, 2, 4, ... -> +1 each
    odds = iters // 2              # i = 1, 3, 5, ... -> +10 each
    want = (evens * 1.0 + odds * 10.0) / 100.0
    np.testing.assert_allclose(f[0, :, 0], want, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], iters / 100.0, atol=1e-6)


MAT_FRAG = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
out vec4 fragment;

void main() {
    float ang = 0.5;
    mat2 rot = mat2(cos(ang), sin(ang), -sin(ang), cos(ang));
    vec2 p = vec2(gl_FragCoord.x / screen.x, gl_FragCoord.y / screen.y);
    vec2 q = rot * p;                 /* mat * vec */
    vec2 w = p * rot;                 /* vec * mat (transpose apply) */
    mat2 twice = rot + rot;           /* componentwise add */
    mat2 prod = rot * transpose(rot); /* ~identity */
    mat3 m3 = mat3(2.0);              /* diagonal */
    vec3 v3 = m3 * vec3(p, 1.0);
    float d = prod[0][0] + prod[1][1] + prod[1][0];
    fragment = vec4(q.x * 0.25 + 0.5, w.y * 0.25 + 0.5,
                    d * 0.25 + twice[0][0] * 0.1, v3.z * 0.5);
}
"""


def test_matrices_mat2_mat3(tmp_path):
    """mat2/mat3: constructors (scalars, diagonal), mat*vec, vec*mat,
    mat*mat, mat+mat, transpose, column/component indexing."""
    mod = tmp_path / "mats"
    mod.mkdir()
    (mod / "1.frag").write_text(MAT_FRAG)
    (tmp_path / "rc.glsl").write_text(
        "#request mod mats\n#request setgeometry 0 0 16 8\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    x = (np.arange(16) + 0.5) / 16.0
    y = ((np.arange(8) + 0.5) / 8.0)[:, None]
    c, s = np.cos(0.5), np.sin(0.5)
    # column-major: rot = [[c, -s], [s, c]] (rows), q = rot @ p
    qx = c * x[None, :] - s * y
    wy = -s * x[None, :] + c * y       # p * rot -> dot(p, col j)
    np.testing.assert_allclose(f[..., 0], qx * 0.25 + 0.5, atol=1e-6)
    np.testing.assert_allclose(f[..., 1], wy * 0.25 + 0.5, atol=1e-6)
    # prod = rot * rot^T = identity -> d = 2.0; twice[0][0] = 2c
    np.testing.assert_allclose(f[..., 2], 2.0 * 0.25 + 2 * c * 0.1,
                               atol=1e-6)
    np.testing.assert_allclose(f[..., 3], 1.0, atol=1e-6)  # 2*1*0.5


def test_shader_errors_cite_include_source_location(tmp_path):
    """Parse errors inside an #include'd file cite the included file's
    path and line (the ss_lookup remap capability,
    glsl_ext.c:358-384 / render.c:374-399)."""
    import pytest

    from glava_tpu.config import preprocessor
    from glava_tpu.config.glsl_shader import ShaderError, parse_shader

    inc = tmp_path / "broken_util.glsl"
    inc.write_text(
        "float helper(float x) {\n"
        "    return x * 2.0;\n"
        "}\n"
        "void junk() {\n"
        "    for (;;) { }\n"         # line 5: parse error (bad for)
        "}\n"
    )
    main = tmp_path / "1.frag"
    main.write_text(
        "out vec4 fragment;\n"
        '#include "broken_util.glsl"\n'
        "void main() { fragment = vec4(1); }\n"
    )
    srcmap: list = []
    ctx = preprocessor.Context(user_dir=tmp_path, system_dir=tmp_path)
    text = preprocessor.preprocess_shader_source(
        main.read_text(), ctx, fname=str(main), current_dir=tmp_path,
        srcmap=srcmap)
    with pytest.raises(ShaderError) as ei:
        parse_shader(text, fname=str(main), srcmap=srcmap)
    msg = str(ei.value)
    assert "broken_util.glsl" in msg, msg
    assert ":5:" in msg, msg


def test_exec_errors_cite_source_line(tmp_path):
    """Exec-time shader failures cite <file>:<line> of the offending
    statement in the ORIGINAL pass file."""
    import pytest

    from glava_tpu.config.glsl_shader import ShaderError

    mod = tmp_path / "bad"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "    float ok = 1.0;\n"
        "    fragment = vec4(undefined_name_xyz, 0, 0, 1);\n"  # line 5
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod bad\n#request setgeometry 0 0 32 16\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    with pytest.raises(ShaderError) as ei:
        _render(lc, n=1)
    msg = str(ei.value)
    assert "1.frag" in msg, msg
    assert ":5:" in msg, msg
    assert "undefined_name_xyz" in msg, msg


def test_graph_aa_latch_scan_bit_exact(tmp_path, monkeypatch):
    """The Pallas latch scan resolves the AA boundary-texel fetch
    (forced in interpret mode) BIT-exactly vs the general gather."""
    from glava_tpu.config import glsl_shader

    (tmp_path / "latch").mkdir()
    (tmp_path / "gen").mkdir()
    glsl_shader._LATCH_HITS[0] = 0
    monkeypatch.setenv("GLAVA_TPU_LATCH", "interpret")
    a, _ = _compare_verbatim(tmp_path / "latch", "graph", (192, 128),
                             knobs="#define ANTI_ALIAS 1\n")
    assert glsl_shader._LATCH_HITS[0] >= 1, "latch path did not fire"
    monkeypatch.setenv("GLAVA_TPU_LATCH", "0")
    b, _ = _compare_verbatim(tmp_path / "gen", "graph", (192, 128),
                             knobs="#define ANTI_ALIAS 1\n")
    assert np.array_equal(a, b), (
        f"latch texels must be bit-exact, max diff {np.abs(a - b).max()}"
    )
    assert ((a[..., 3] > 0) & (a[..., 3] < 0.99)).mean() > 0.005


LATCH_ADJ_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

float walk_up(float x) {
    float y = gl_FragCoord.y;
    while (y < screen.y + 3.0) {         /* cond-exit OUT of texture; */
        vec4 f = texelFetch(tex, ivec2(x, y), 0);
        if (f.a <= 0) {
            y -= 1;                      /* break-ADJUST: latched     */
            break;                       /* texel is the row above    */
        }
        y += 1;
    }
    return y;
}

void main() {
    float h2 = walk_up(gl_FragCoord.x);
    vec4 c = texelFetch(tex, ivec2(gl_FragCoord.x, h2), 0);
    fragment = vec4(c.r, c.a, h2 / screen.y, 1.0);
}
"""


def test_latch_scan_break_adjust_and_out_events(tmp_path, monkeypatch):
    """Latch path with a break-adjusted up-walk whose cond-exit lies
    out of texture (pred(black) true -> an OUT hit event at row h that
    adjusts back to the in-range row h-1): bit-exact vs the general
    resolution, and the latch must actually fire."""
    from glava_tpu.config import glsl_shader

    glsl_shader._LATCH_HITS[0] = 0
    monkeypatch.setenv("GLAVA_TPU_LATCH", "interpret")
    a, _ = _walk_render(tmp_path, "latchadj", True,
                        frag2=LATCH_ADJ_FRAG2)
    assert glsl_shader._LATCH_HITS[0] >= 1, "latch path did not fire"
    monkeypatch.setenv("GLAVA_TPU_LATCH", "0")
    b, _ = _walk_render(tmp_path, "latchadj_off", True,
                        frag2=LATCH_ADJ_FRAG2)
    assert np.array_equal(a, b), (
        f"latch adj texels must be bit-exact, max diff "
        f"{np.abs(a - b).max()}"
    )
    c, _ = _walk_render(tmp_path, "latchadj_gen", False,
                        frag2=LATCH_ADJ_FRAG2)
    assert np.array_equal(a, c)


def test_dfdx_dfdy_fwidth_quad_semantics(tmp_path):
    """Screen-space derivatives use GL's coarse 2x2-quad rule: both
    fragments of a pixel pair see the same odd-even difference."""
    mod = tmp_path / "dd"
    mod.mkdir()
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "  float v = gl_FragCoord.x * gl_FragCoord.x * 0.004\n"
        "          + gl_FragCoord.y * 0.05;\n"
        "  fragment = vec4(dFdx(v), dFdy(v), fwidth(v) * 0.5, 1);\n"
        "}\n"
    )
    (tmp_path / "rc.glsl").write_text(
        "#request mod dd\n#request setgeometry 0 0 8 4\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    f = _render(lc, n=1)
    x = np.arange(8) + 0.5
    y = (np.arange(4) + 0.5)[:, None]
    v = x * x * 0.004 + y * 0.05
    ddx = np.repeat(v[:, 1::2] - v[:, 0::2], 2, axis=1)   # quad pairs
    ddy = np.repeat(v[1::2, :] - v[0::2, :], 2, axis=0)
    np.testing.assert_allclose(f[..., 0], ddx, atol=1e-5)
    np.testing.assert_allclose(f[..., 1], ddy, atol=1e-5)
    np.testing.assert_allclose(f[..., 2], (np.abs(ddx) + np.abs(ddy)) / 2,
                               atol=1e-5)


# ---------------------------------------------------------------------------
# Uniform-step walk fast path: while loops stepping a row-coordinate
# variable by a constant lower their column-aligned prev fetches to
# vertical dynamic-slice shifts (no gather). _WALK_HITS pins that the
# path actually fires; parity on/off must be BIT-exact, including the
# out-of-range and int(-0.5)==0 edge rows.
# ---------------------------------------------------------------------------

WALK_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

float walk_up(float x, float oy) {
    float y = oy;
    while (y < screen.y + 3) {          /* deliberately walks OOB */
        vec4 f = texelFetch(tex, ivec2(x, y), 0);
        if (f.a <= 0) {
            y -= 1;                      /* break-adjust write */
            break;
        }
        y += 1;
    }
    return y;
}

float walk_down(float x, float oy) {
    float y = oy;
    while (y >= -2) {                    /* walks past row 0: int(-0.5)==0 */
        vec4 f = texelFetch(tex, ivec2(x, y), 0);
        if (f.a > 0) {
            break;
        }
        y -= 1;
    }
    return y;
}

void main() {
    float up = walk_up(gl_FragCoord.x - 1, gl_FragCoord.y);
    float dn = walk_down(gl_FragCoord.x + 1, gl_FragCoord.y);
    fragment = vec4(up / screen.y, dn / screen.y,
                    texelFetch(tex, ivec2(gl_FragCoord.x, gl_FragCoord.y), 0).a,
                    1.0);
}
"""


def _walk_render(tmp_path, sub, walk_on, frag2=None):
    import os
    from glava_tpu.config import glsl_shader

    d = tmp_path / sub
    d.mkdir()
    lc = _setup(d, frag2=frag2 or WALK_FRAG2)
    old = os.environ.get("GLAVA_TPU_WALK_SHIFT")
    os.environ["GLAVA_TPU_WALK_SHIFT"] = "1" if walk_on else "0"
    glsl_shader._WALK_HITS[0] = 0
    try:
        f = _render(lc, n=3)
    finally:
        if old is None:
            os.environ.pop("GLAVA_TPU_WALK_SHIFT", None)
        else:
            os.environ["GLAVA_TPU_WALK_SHIFT"] = old
    return f, glsl_shader._WALK_HITS[0]


def test_walk_shift_fast_path_bit_exact(tmp_path):
    a, hits_on = _walk_render(tmp_path, "on", True)
    b, hits_off = _walk_render(tmp_path, "off", False)
    assert hits_on == 2, f"walk path should cover both loops, hit {hits_on}"
    assert hits_off == 0
    assert np.array_equal(a, b), (
        f"walk shift must be bit-exact, max diff {np.abs(a - b).max()}"
    )
    # sanity: the walks produced varying per-column heights
    assert np.unique(np.round(a[..., 0] * 96)).size > 3


CONDITIONAL_STEP_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

void main() {
    float y = gl_FragCoord.y;
    float acc = 0;
    while (y < screen.y) {
        vec4 f = texelFetch(tex, ivec2(gl_FragCoord.x, y), 0);
        acc += f.a;
        if (f.a > 0) {
            y += 2;                      /* conditional step: NOT uniform */
        }
        y += 1;
    }
    fragment = vec4(acc / screen.y, y / screen.y, 0, 1);
}
"""


def test_walk_shift_rejects_conditional_step(tmp_path):
    a, hits = _walk_render(tmp_path, "cond", True,
                           frag2=CONDITIONAL_STEP_FRAG2)
    assert hits == 0, "conditional extra step must not be detected as a walk"
    b, _ = _walk_render(tmp_path, "cond_off", False,
                        frag2=CONDITIONAL_STEP_FRAG2)
    assert np.array_equal(a, b)


ACCUM_WALK_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

void main() {
    float y = gl_FragCoord.y;
    float acc = 0;
    while (y < screen.y) {               /* extra carried var `acc`:   */
        vec4 f = texelFetch(tex, ivec2(gl_FragCoord.x, y), 0);
        if (f.a <= 0) { break; }         /* first-hit lowering bails,  */
        acc += f.r;                      /* the per-iteration walk-    */
        y += 1;                          /* SHIFT fast path serves the */
    }                                    /* fetch instead              */
    fragment = vec4(acc / screen.y, y / screen.y, 0, 1);
}
"""


def test_walk_shift_serves_non_first_hit_loops(tmp_path):
    """A uniform-step walk with extra carried state rejects the
    first-hit scan but still gets gather-free dynamic-slice fetches;
    parity with the general path is bit-exact."""
    a, hits = _walk_render(tmp_path, "acc", True, frag2=ACCUM_WALK_FRAG2)
    b, _ = _walk_render(tmp_path, "acc_off", False, frag2=ACCUM_WALK_FRAG2)
    assert hits >= 1
    assert np.array_equal(a, b)
    assert np.unique(np.round(a[..., 0] * 96)).size > 3  # accumulated data


# ---------------------------------------------------------------------------
# First-hit / walk-shift regression pins (review findings): each of
# these shapes previously diverged from the general masked-loop
# lowering; all must now be BIT-exact against GLAVA_TPU_WALK_SHIFT=0.
# ---------------------------------------------------------------------------

SIG_COLLISION_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

float walk(float x, float lim) {
    float y = gl_FragCoord.y;
    while (y < lim) {                    /* same tokens, DIFFERENT   */
        vec4 f = texelFetch(tex, ivec2(x, y), 0);  /* bound scalars  */
        if (f.a <= 0) { break; }
        y += 1;
    }
    return y;
}

void main() {
    float a = walk(gl_FragCoord.x, 5.0);
    float b = walk(gl_FragCoord.x, 90.0);
    fragment = vec4(a / screen.y, b / screen.y, 0, 1);
}
"""

STEP2_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

void main() {
    float y = gl_FragCoord.y;
    while (y < screen.y) {
        vec4 f = texelFetch(tex, ivec2(gl_FragCoord.x, y), 0);
        if (f.a <= 0) { break; }
        y += 2;                          /* |d| != 1: scan must bail */
    }
    fragment = vec4(y / (2.0 * screen.y), 0, 0, 1);
}
"""

CONST_X_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

void main() {
    float y = gl_FragCoord.y;
    while (y < screen.y) {               /* fixed column 3: ('const') */
        vec4 f = texelFetch(tex, ivec2(3, y), 0);
        if (f.a <= 0) { break; }
        y += 1;
    }
    float z = gl_FragCoord.y;
    while (z < screen.y) {               /* out-of-range fixed column */
        vec4 f = texelFetch(tex, ivec2(screen.x + 7, z), 0);
        if (f.a > 0) { break; }
        z += 1;
    }
    fragment = vec4(y / screen.y, z / screen.y, 0, 1);
}
"""


FAR_COND_EXIT_FRAG2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

void main() {
    float y = gl_FragCoord.y;
    while (y < 500.0) {                  /* cond-exit FAR beyond the  */
        vec4 f = texelFetch(tex, ivec2(gl_FragCoord.x, y), 0);
        if (f.a > 0.5) { break; }        /* 2h+M scan window but well */
        y += 1;                          /* before the fuel cap       */
    }
    float z = gl_FragCoord.y;
    while (z > -360.0) {                 /* same walking down */
        vec4 f = texelFetch(tex, ivec2(gl_FragCoord.x, z), 0);
        if (f.a > 0.5) { break; }
        z -= 1;
    }
    fragment = vec4(y / 512.0, -z / 512.0, 0, 1);
}
"""


@pytest.mark.parametrize("frag2,tag", [
    (SIG_COLLISION_FRAG2, "sigvals"),
    (STEP2_FRAG2, "step2"),
    (CONST_X_FRAG2, "constx"),
    (FAR_COND_EXIT_FRAG2, "farcond"),
])
def test_walk_regressions_bit_exact(tmp_path, frag2, tag):
    a, _ = _walk_render(tmp_path, tag, True, frag2=frag2)
    b, _ = _walk_render(tmp_path, tag + "_off", False, frag2=frag2)
    assert np.array_equal(a, b), (
        f"{tag}: max diff {np.abs(a - b).max()}"
    )
    assert np.unique(np.round(a[..., 0] * 96)).size > 1


def test_returnless_loop_restores_pristine_mask(tmp_path):
    """After a data-dependent loop with no lexical `return`, top-level
    assignments stay concrete numpy (the pristine-mask identity is
    restored), so downstream axis-constant fast paths keep firing."""
    import jax.core
    from glava_tpu.config import glsl_shader

    frag2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

float half_w;

void main() {
    float y = gl_FragCoord.y;
    while (y < screen.y) {
        vec4 f = texelFetch(tex, ivec2(gl_FragCoord.x, y), 0);
        if (f.a <= 0) { break; }
        y += 1;
    }
    half_w = screen.x / 2;     /* must stay a concrete scalar */
    fragment = vec4(y / screen.y, half_w / screen.x, 0, 1);
}
"""
    seen = []
    orig = glsl_shader._Exec._masked_set

    def spy(self, name, value):
        if name == "half_w":
            seen.append(isinstance(value, jax.core.Tracer)
                        or self.mask is not self._full_mask)
        return orig(self, name, value)

    glsl_shader._Exec._masked_set = spy
    try:
        f, _ = _walk_render(tmp_path, "mask", True, frag2=frag2)
    finally:
        glsl_shader._Exec._masked_set = orig
    assert seen and not any(seen), (
        "half_w assignment after the loop lost the pristine mask"
    )
    assert np.isfinite(f).all()
