"""GLSL integer bit/shift operators in the drop-in interpreter.

The reference hands user .frag files to the GL compiler, so community
module packs inherit full GLSL — including the integer hash/packing
idioms (`(h << 3) ^ (h >> 1)`, masks, `~`). Renders shaders using
every operator (plus compound forms) and checks against the same
arithmetic in numpy int32."""

import numpy as np

from tests.test_glsl_structs import _render_module


def _expect(x):
    h = x.astype(np.int32)
    h = (h << 3) ^ (h >> 1)
    h = (h & 29) | 2
    h = ~h & 63
    h = h ^ 5
    h = h % np.int32(37)
    return h


def test_bit_and_shift_operators(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    int h = int(gl_FragCoord.x);
    h = (h << 3) ^ (h >> 1);
    h = (h & 29) | 2;
    h = ~h & 63;
    h ^= 5;
    int m = h - int(float(h) / 37.0) * 37;   // h % 37, h >= 0
    float v = float(m) / 64.0;
    fragment = vec4(v, float(h & 1), float((h | 1) - h), 1.0);
}
"""
    f = _render_module(tmp_path, "bits", frag, screen=(16, 2))
    x = np.arange(16)
    h = _expect(x)
    # _expect applies % 37 last; reconstruct pre-% h for channels 1-2
    h_pre = ((~(((x.astype(np.int32) << 3) ^ (x.astype(np.int32) >> 1))
              & 29 | 2)) & 63) ^ 5
    np.testing.assert_allclose(f[0, :, 0], (h_pre % 37) / 64.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], (h_pre & 1).astype(np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(
        f[0, :, 2], ((h_pre | 1) - h_pre).astype(np.float32), atol=1e-6)


def test_bit_precedence_matches_c(tmp_path):
    """`a & b ^ c | d` groups ((a&b)^c)|d; shifts bind tighter than
    relational (`1 << 2 < 8` is (1<<2) < 8 -> true)."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    int a = 12; int b = 10; int c = 6; int d = 1;
    int g = a & b ^ c | d;            // ((12&10)^6)|1 = (8^6)|1 = 15
    float r = (1 << 2 < 8) ? 0.5 : 0.0;
    fragment = vec4(float(g) / 16.0, r, float(5 % 3) / 4.0, 1.0);
}
"""
    f = _render_module(tmp_path, "prec", frag, screen=(4, 2))
    np.testing.assert_allclose(f[..., 0], 15.0 / 16.0, atol=1e-6)
    np.testing.assert_allclose(f[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(f[..., 2], 0.5, atol=1e-6)


def test_compound_shift_assign_under_branch(tmp_path):
    """`<<=`/`>>=`/`&=`/`|=` compound forms, including under a
    per-pixel mask (merged like any other masked write)."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    int h = int(gl_FragCoord.x) + 1;
    if (gl_FragCoord.x < 4.0) {
        h <<= 2;
    } else {
        h >>= 1;
    }
    h |= 1;
    h &= 127;
    fragment = vec4(float(h) / 128.0, 0.0, 0.0, 1.0);
}
"""
    f = _render_module(tmp_path, "csh", frag, screen=(8, 2))
    x = np.arange(8) + 1
    h = np.where(np.arange(8) < 4, x << 2, x >> 1)
    h = (h | 1) & 127
    np.testing.assert_allclose(f[0, :, 0], h / 128.0, atol=1e-6)


def test_increment_statements_and_comma_for_init(tmp_path):
    """`i++;`/`--i;`/`v.x++;` statements and extra declarators in a
    for-init (`for (int i = 0, j = 2; ...)`)."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    float i = 0.0;
    i++;
    i += 1.0;
    --i;
    vec2 v = vec2(0.0, 0.25);
    v.x++;
    float s = 0.0;
    for (int k = 0, j = 2; k < 3; k++) { s += float(j); }
    fragment = vec4(i / 4.0, v.x / 2.0, s / 8.0, 1.0);
}
"""
    f = _render_module(tmp_path, "inc", frag, screen=(4, 2))
    np.testing.assert_allclose(f[..., 0], 0.25, atol=1e-6)  # i == 1
    np.testing.assert_allclose(f[..., 1], 0.5, atol=1e-6)   # v.x == 1
    np.testing.assert_allclose(f[..., 2], 0.75, atol=1e-6)  # s == 6


def test_version_and_precision_lines_tolerated(tmp_path):
    """Community shaders often carry `#version` and GLSL-ES
    `precision` statements; both are handled out-of-band."""
    frag = """
#version 330
precision mediump float;
in vec4 gl_FragCoord;
out vec4 fragment;
void main() { fragment = vec4(0.5, 0.0, 0.0, 1.0); }
"""
    f = _render_module(tmp_path, "vp", frag, screen=(4, 2))
    np.testing.assert_allclose(f[..., 0], 0.5, atol=1e-6)


def test_hex_and_uint_suffix_literals(tmp_path):
    """0x... hex literals and u/U suffixes tokenize (idiomatic uint
    hash shaders: `h &= 0x7fu; h ^= h >> 3u;`)."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    int h = int(gl_FragCoord.x) + 0x10;
    h &= 0x7fu;
    h ^= h >> 3u;
    fragment = vec4(float(h) / 255.0, float(0xFF) / 255.0, 0.0, 1.0);
}
"""
    f = _render_module(tmp_path, "hex", frag, screen=(8, 2))
    h = (np.arange(8) + 0x10) & 0x7F
    h = h ^ (h >> 3)
    np.testing.assert_allclose(f[0, :, 0], h / 255.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], 1.0, atol=1e-6)


def test_equality_binds_looser_than_relational(tmp_path):
    """GLSL/C: `a == b < c` parses as `a == (b < c)`."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    float r = (0.0 == 2.0 < 3.0) ? 1.0 : 0.25;  // 0 == true -> false
    fragment = vec4(r, 0.0, 0.0, 1.0);
}
"""
    f = _render_module(tmp_path, "prel", frag, screen=(4, 2))
    np.testing.assert_allclose(f[..., 0], 0.25, atol=1e-6)


def test_for_init_extra_declarator_references_counter(tmp_path):
    """`for (int i = 2, j = i; ...)`: declarators initialize
    left-to-right, so j reads the fresh counter value."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    float s = 0.0;
    for (int i = 2, j = i; i < 4; i++) { s += float(j); }
    fragment = vec4(s / 8.0, 0.0, 0.0, 1.0);
}
"""
    f = _render_module(tmp_path, "fic", frag, screen=(4, 2))
    np.testing.assert_allclose(f[..., 0], 0.5, atol=1e-6)  # 2+2 = 4


def test_decrementing_for_loops(tmp_path):
    """`for (i = N; i > 0; i--)` and `i -= k` decrementing forms, both
    concrete-unrolled and with a data-dependent bound."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    float s = 0.0;
    for (int i = 4; i > 0; i--) { s += float(i); }       // 4+3+2+1
    float t = 0.0;
    for (float k = 1.0; k >= 0.25; k -= 0.25) { t += k; } // 1+.75+.5+.25
    float u = 0.0;
    float lim = gl_FragCoord.x;  // per-pixel bound -> while lowering
    for (float m = 3.0; m > lim; m -= 1.0) { u += 1.0; }
    fragment = vec4(s / 16.0, t / 4.0, u / 4.0, 1.0);
}
"""
    f = _render_module(tmp_path, "dec", frag, screen=(8, 2))
    np.testing.assert_allclose(f[..., 0], 10.0 / 16.0, atol=1e-6)
    np.testing.assert_allclose(f[..., 1], 2.5 / 4.0, atol=1e-6)
    x = np.arange(8) + 0.5
    u = np.maximum(np.ceil(3.0 - x), 0)  # iterations of m=3,2,... > x
    np.testing.assert_allclose(f[0, :, 2], u / 4.0, atol=1e-6)
