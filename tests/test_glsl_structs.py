"""User-declared GLSL structs in the drop-in shader interpreter.

The reference feeds user .frag files to the GL compiler
(render.c:1488-1597), so community module packs can use the full GLSL
surface; structs are part of the drop-in compatibility target. Each
test renders a struct-using shader and its struct-free equivalent and
compares pixels.
"""

import numpy as np
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer


def _render_module(tmp_path, name, frag, screen=(16, 8), n=3):
    mod = tmp_path / name
    mod.mkdir(parents=True, exist_ok=True)
    (mod / "1.frag").write_text(frag)
    (tmp_path / "rc.glsl").write_text(
        f"#request mod {name}\n"
        f"#request setgeometry 0 0 {screen[0]} {screen[1]}\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
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


def test_struct_constructor_fields_and_default_init(tmp_path):
    """Declaration, constructor, field read/write, zero default-init,
    and the `struct {...} var;` trailing variable form."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;

struct Ray { vec2 origin; float len; } globalRay;

void main() {
    Ray r = Ray(vec2(0.25, 0.5), 2.0);
    r.len = r.len * 2.0;            // field assignment
    Ray d;                          // default init: all zeros
    d.origin = r.origin;            // field copy
    globalRay.len = 0.125;          // trailing-var declaration works
    fragment = vec4(r.origin.x, d.origin.y, r.len / 8.0,
                    globalRay.len + d.len + 0.875);
}
"""
    f = _render_module(tmp_path, "st", frag)
    np.testing.assert_allclose(f[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(f[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(f[..., 2], 0.5, atol=1e-6)
    np.testing.assert_allclose(f[..., 3], 1.0, atol=1e-6)


def test_struct_masked_field_assign_matches_structfree(tmp_path):
    """Field writes under a per-pixel condition merge per pixel —
    identical output to the struct-free formulation."""
    body = """
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
"""
    struct_frag = body + """
struct Mat { vec3 color; float gain; };

Mat shade(float v) {
    if (v > 0.01) return Mat(vec3(1.0, 0.5, 0.25), v * 4.0);
    return Mat(vec3(0.0, 0.0, 1.0), 1.0);
}

void main() {
    float pos = gl_FragCoord.x / screen.x;
    float v = smooth_audio(audio_l, audio_sz, pos);
    Mat m = shade(v);
    if (gl_FragCoord.y < 4.0) {
        m.gain = m.gain * 0.5;          // masked field write
        m.color.x = 0.125;              // nested member read-modify
    }
    fragment = vec4(m.color * clamp(m.gain, 0.0, 1.0), 1.0);
}
"""
    plain_frag = body + """
void main() {
    float pos = gl_FragCoord.x / screen.x;
    float v = smooth_audio(audio_l, audio_sz, pos);
    vec3 color; float gain;
    if (v > 0.01) { color = vec3(1.0, 0.5, 0.25); gain = v * 4.0; }
    else { color = vec3(0.0, 0.0, 1.0); gain = 1.0; }
    if (gl_FragCoord.y < 4.0) {
        gain = gain * 0.5;
        color.x = 0.125;
    }
    fragment = vec4(color * clamp(gain, 0.0, 1.0), 1.0);
}
"""
    a = _render_module(tmp_path / "a", "m1", struct_frag)
    b = _render_module(tmp_path / "b", "m2", plain_frag)
    np.testing.assert_allclose(a, b, atol=1e-6)


def test_struct_nested_member_write(tmp_path):
    """`m.color.x = v` — the nested lvalue chain above covers the read
    path; this pins the write result componentwise."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
struct P { vec2 uv; };
void main() {
    P p = P(vec2(0.0, 0.75));
    p.uv.x = 0.25;
    fragment = vec4(p.uv, 0.0, 1.0);
}
"""
    f = _render_module(tmp_path, "nm", frag)
    np.testing.assert_allclose(f[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(f[..., 1], 0.75, atol=1e-6)


def test_struct_rides_while_loop_carry(tmp_path):
    """A struct mutated inside a data-dependent loop is carried through
    the masked lax.while_loop lowering (pytree registration)."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
struct Acc { float total; float steps; };
void main() {
    Acc a = Acc(0.0, 0.0);
    float limit = gl_FragCoord.x + 0.5;
    while (a.steps < limit) {
        a.total = a.total + 2.0;
        a.steps = a.steps + 1.0;
        if (a.total > 10.0) break;
    }
    fragment = vec4(a.total / 16.0, a.steps / 16.0, 0, 1);
}
"""
    f = _render_module(tmp_path, "wl", frag, screen=(8, 2))
    x = np.arange(8)
    # per pixel: steps = min(ceil(limit), 6) since total breaks at 12
    steps = np.minimum(x + 1, 6)
    np.testing.assert_allclose(f[0, :, 0], 2.0 * steps / 16.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], steps / 16.0, atol=1e-6)


def test_struct_array_default_init_and_element_field_write(tmp_path):
    """`S a[N];` zero-fills struct elements; `a[i].field = v` chains
    index + member through the nested-lvalue path."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
struct Pt { vec2 pos; float wgt; };
void main() {
    Pt pts[2];
    pts[0].pos = vec2(0.25, 0.5);
    pts[1].wgt = 0.75;
    pts[1].pos.y = 0.125;            // three-level chain
    fragment = vec4(pts[0].pos.x, pts[0].wgt + pts[1].pos.y,
                    pts[1].wgt, pts[0].pos.y + 0.5);
}
"""
    f = _render_module(tmp_path, "sa", frag)
    np.testing.assert_allclose(f[..., 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(f[..., 1], 0.125, atol=1e-6)  # 0 + 0.125
    np.testing.assert_allclose(f[..., 2], 0.75, atol=1e-6)
    np.testing.assert_allclose(f[..., 3], 1.0, atol=1e-6)


def test_struct_returning_helper_multiple_sites(tmp_path):
    """Struct-returning helpers merge per-pixel across return sites."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
struct C { vec3 rgb; };
C pick(float x) {
    if (x < 4.0) return C(vec3(1.0, 0.0, 0.0));
    return C(vec3(0.0, 1.0, 0.0));
}
void main() {
    C c = pick(gl_FragCoord.x);
    fragment = vec4(c.rgb, 1.0);
}
"""
    f = _render_module(tmp_path, "rh", frag, screen=(8, 2))
    np.testing.assert_allclose(f[0, :4, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :4, 1], 0.0, atol=1e-6)
    np.testing.assert_allclose(f[0, 4:, 0], 0.0, atol=1e-6)
    np.testing.assert_allclose(f[0, 4:, 1], 1.0, atol=1e-6)


def test_aggregate_equality_struct_vec_mat(tmp_path):
    """GLSL 4.60 §5.9 aggregate equality: `==`/`!=` on structs,
    vectors and matrices yield ONE per-pixel bool (all members equal),
    unlike equal(). Mixed per-pixel outcome exercises the traced path;
    the all-constant comparisons exercise the numpy-concrete fold."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
struct Pt { vec2 pos; float wgt; };
void main() {
    Pt a = Pt(vec2(1.0, 2.0), 3.5);
    Pt b = Pt(vec2(1.0, 2.0), 3.5);
    Pt c = Pt(vec2(1.0, 2.0), gl_FragCoord.x);  // per-pixel field
    float r = (a == b) ? 1.0 : 0.0;             // concrete: equal
    float g = (a != c) ? 1.0 : 0.0;             // traced: x != 3.5 -> 1
    vec2 v = vec2(gl_FragCoord.x, 2.0);
    float bl = (v == vec2(3.5, 2.0)) ? 1.0 : 0.0;  // vec aggregate
    mat2 m1 = mat2(1.0);
    float al = (m1 == mat2(1.0)) ? 0.75 : 0.0;     // mat aggregate
    fragment = vec4(r, g, bl, al);
}
"""
    f = _render_module(tmp_path, "eq", frag, screen=(8, 2))
    x = np.arange(8) + 0.5  # gl_FragCoord.x at pixel centers
    np.testing.assert_allclose(f[0, :, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], (x != 3.5).astype(np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(f[0, :, 2], (x == 3.5).astype(np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(f[0, :, 3], 0.75, atol=1e-6)


def test_struct_ternary_per_pixel_select(tmp_path):
    """`cond ? structA : structB` with a per-pixel condition selects
    fieldwise (including nested vec fields)."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
struct Pt { vec2 pos; float wgt; };
void main() {
    Pt a = Pt(vec2(0.25, 0.5), 1.0);
    Pt b = Pt(vec2(0.75, 0.125), 0.0);
    Pt p = (gl_FragCoord.x < 4.0) ? a : b;
    fragment = vec4(p.pos, p.wgt, 1.0);
}
"""
    f = _render_module(tmp_path, "tern", frag, screen=(8, 2))
    np.testing.assert_allclose(f[0, :4, 0], 0.25, atol=1e-6)
    np.testing.assert_allclose(f[0, 4:, 0], 0.75, atol=1e-6)
    np.testing.assert_allclose(f[0, :4, 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(f[0, 4:, 1], 0.125, atol=1e-6)
    np.testing.assert_allclose(f[0, :4, 2], 1.0, atol=1e-6)
    np.testing.assert_allclose(f[0, 4:, 2], 0.0, atol=1e-6)
