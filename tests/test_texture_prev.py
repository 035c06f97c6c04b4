"""`texture(sampler2D prev, vec2 uv)` in the drop-in interpreter.

The prev FBO texture is GL_NEAREST (render.c:545-547) with the GL
default GL_REPEAT wrap; `texture()` maps normalized coords to texel
indices and rides the texelFetch routing (identity/shift fast paths,
concrete-index machinery, general fetch)."""

import numpy as np
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

PASS1 = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    fragment = vec4(gl_FragCoord.x / 16.0, gl_FragCoord.y / 8.0,
                    0.25, 1.0);
}
"""

PASS2 = """
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;
void main() {
    vec2 uv = vec2(gl_FragCoord.x / screen.x, gl_FragCoord.y / screen.y);
    vec4 a = texture(tex, uv);                       // identity
    vec4 b = texture(tex, vec2(uv.x + 1.0, uv.y));   // REPEAT wrap
    vec4 m = texture(tex, vec2(1.0 - uv.x, uv.y));   // mirror (general)
    vec4 c = texelFetch(tex, ivec2(gl_FragCoord.x, gl_FragCoord.y), 0);
    fragment = vec4(a.r, b.r, m.r, c.r);
}
"""


def _render(tmp_path, screen=(16, 8)):
    mod = tmp_path / "tx"
    mod.mkdir(parents=True, exist_ok=True)
    (mod / "1.frag").write_text(PASS1)
    (mod / "2.frag").write_text(PASS2)
    (tmp_path / "rc.glsl").write_text(
        f"#request mod tx\n"
        f"#request setgeometry 0 0 {screen[0]} {screen[1]}\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n")
    lc = loader.load(user_dir=tmp_path)
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3)
    for _ in range(3):
        state, frame = step(state, snap, True, np.float32(0.0),
                            np.float32(1.0), np.float32(0.05), {})
    return np.asarray(frame)


def test_texture_on_prev_identity_wrap_and_mirror(tmp_path):
    f = _render(tmp_path)
    r_pass1 = (np.arange(16) + 0.5) / 16.0  # pass-1 red = fragcoord.x/16
    # identity texture() == texelFetch == pass-1 value
    np.testing.assert_allclose(f[0, :, 0], f[0, :, 3], atol=1e-6)
    np.testing.assert_allclose(f[0, :, 0], r_pass1, atol=1e-6)
    # uv.x + 1.0 wraps (GL_REPEAT): identical column
    np.testing.assert_allclose(f[0, :, 1], f[0, :, 0], atol=1e-6)
    # 1 - uv.x mirrors: NEAREST texel of (1-u) is column 15-x
    np.testing.assert_allclose(f[0, :, 2], r_pass1[::-1], atol=1e-6)


PASS2_SIZE = """
in vec4 gl_FragCoord;
#request uniform "prev" tex
uniform sampler2D tex;
#request uniform "audio_l" audio_l
#request transform audio_l "fft"
uniform sampler1D audio_l;
out vec4 fragment;
void main() {
    ivec2 ts = textureSize(tex, 0);
    int asz = textureSize(audio_l, 0);
    vec2 uv = vec2(gl_FragCoord.x / ts.x, gl_FragCoord.y / ts.y);
    vec4 a = textureLod(tex, uv, 0.0);
    fragment = vec4(a.r, float(ts.x) / 32.0, float(ts.y) / 32.0,
                    asz > 0 ? 1.0 : 0.0);
}
"""


def test_texture_size_and_lod(tmp_path):
    mod = tmp_path / "tx"
    mod.mkdir(parents=True, exist_ok=True)
    (mod / "1.frag").write_text(PASS1)
    (mod / "2.frag").write_text(PASS2_SIZE)
    (tmp_path / "rc.glsl").write_text(
        "#request mod tx\n#request setgeometry 0 0 16 8\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n")
    lc = loader.load(user_dir=tmp_path)
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3)
    for _ in range(3):
        state, frame = step(state, snap, True, np.float32(0.0),
                            np.float32(1.0), np.float32(0.05), {})
    f = np.asarray(frame)
    np.testing.assert_allclose(f[0, :, 0], (np.arange(16) + 0.5) / 16.0,
                               atol=1e-6)
    np.testing.assert_allclose(f[..., 1], 16.0 / 32.0, atol=1e-6)
    np.testing.assert_allclose(f[..., 2], 8.0 / 32.0, atol=1e-6)
    np.testing.assert_allclose(f[..., 3], 1.0, atol=1e-6)


def test_wrap_pattern_classified_not_gathered():
    """REPEAT-wrapped offset indices ([d, d+1, .., n-1, 0, .., d-1]
    shifted) classify as a 'wrap' axis pattern (lowered as a roll —
    two slices + one concat), NOT the pathological 2-D gather."""
    from glava_tpu.config.glsl_shader import _axis_pattern

    n = 16
    base = np.arange(n)
    # texture(tex, uv.x - 1/W): index (x - 1) mod n
    assert _axis_pattern((base - 1) % n, n) == ("wrap", n - 1)
    assert _axis_pattern((base + 3) % n, n) == ("wrap", 3)
    # plain shift/clamp0/const still classify as themselves
    assert _axis_pattern(base + 2, n) == ("shift", 2)
    assert _axis_pattern(np.maximum(base - 1, 0), n) == ("clamp0", -1)
    assert _axis_pattern(np.full(n, 5), n) == ("const", 5)


def test_concrete_struct_ternary_stays_numpy():
    """A ?: on fully host-concrete structs must select in numpy — one
    jnp op would turn the coordinate-derived fields into tracers and
    defeat the concrete fast paths (CLAUDE.md invariant)."""
    from glava_tpu.config import glsl_expr as ge

    cond = np.arange(8) < 4
    s1 = ge.GlslStruct("S", ("a", "b"), (np.float32(1.0),
                                         np.arange(8, dtype=np.float32)))
    s2 = ge.GlslStruct("S", ("a", "b"), (np.float32(2.0),
                                         np.zeros(8, np.float32)))
    env = ge.Env(variables={"c": cond, "s1": s1, "s2": s2})
    out = ge.evaluate("c ? s1 : s2", env)
    assert isinstance(out, ge.GlslStruct)
    for v in out.vals:
        assert isinstance(v, np.ndarray), type(v)
    np.testing.assert_allclose(out.get("a"), np.where(cond, 1.0, 2.0))
