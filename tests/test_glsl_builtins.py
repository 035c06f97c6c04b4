"""GLSL builtin-function surface: geometric, vector-relational and
remaining transcendental/rounding builtins (GLSL 4.60 §8.1-8.7),
rendered through the interpreter and checked against numpy."""

import numpy as np

from tests.test_glsl_structs import _render_module


def test_geometric_builtins(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    vec2 p = vec2(gl_FragCoord.x / 8.0, 0.5);
    float l = length(p);
    float d = distance(p, vec2(0.0, 0.5));
    vec2 n = normalize(vec2(3.0, 4.0));
    float dt = dot(p, vec2(1.0, 2.0));
    fragment = vec4(l / 4.0, d / 4.0, n.x, dt / 8.0);
}
"""
    f = _render_module(tmp_path, "geo", frag, screen=(8, 2))
    x = (np.arange(8) + 0.5) / 8.0
    l = np.sqrt(x * x + 0.25)
    np.testing.assert_allclose(f[0, :, 0], l / 4.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], x / 4.0, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 2], 0.6, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 3], (x + 1.0) / 8.0, atol=1e-6)


def test_cross_reflect_refract(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    vec3 c = cross(vec3(1.0, 0.0, 0.0), vec3(0.0, 1.0, 0.0));
    vec2 r = reflect(vec2(1.0, -1.0), vec2(0.0, 1.0));
    vec2 t = refract(vec2(0.0, -1.0), vec2(0.0, 1.0), 0.5);
    vec2 ff = faceforward(vec2(0.0, 1.0), vec2(0.0, 1.0), vec2(0.0, 1.0));
    fragment = vec4(c.z, r.y * 0.5 + 0.5, -t.y, ff.y * 0.25 + 0.5);
}
"""
    f = _render_module(tmp_path, "gref", frag, screen=(4, 2))
    np.testing.assert_allclose(f[..., 0], 1.0, atol=1e-6)   # x cross y = z
    np.testing.assert_allclose(f[..., 1], 1.0, atol=1e-6)   # reflect y: -1->1
    np.testing.assert_allclose(f[..., 2], 1.0, atol=1e-6)   # straight-through
    # faceforward: dot(Nref, I) = 1 > 0 -> returns -N -> y=-1 -> 0.25
    np.testing.assert_allclose(f[..., 3], 0.25, atol=1e-6)


def test_vector_relational_any_all_not(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    vec2 p = vec2(gl_FragCoord.x, 4.0);
    bvec2 g = greaterThan(p, vec2(3.0, 3.0));     // (x>3, true)
    bvec2 l = lessThanEqual(p, vec2(3.0, 3.0));   // (x<=3, false)
    fragment = vec4(any(l) ? 1.0 : 0.0,
                    all(g) ? 1.0 : 0.0,
                    any(not(g)) ? 1.0 : 0.0,
                    all(equal(p, p)) ? 1.0 : 0.0);
}
"""
    f = _render_module(tmp_path, "rel", frag, screen=(8, 2))
    x = np.arange(8) + 0.5
    np.testing.assert_allclose(f[0, :, 0], (x <= 3).astype(np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], (x > 3).astype(np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(f[0, :, 2], (x <= 3).astype(np.float32),
                               atol=1e-6)
    np.testing.assert_allclose(f[0, :, 3], 1.0, atol=1e-6)


def test_transcendental_and_rounding_extras(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    float u = gl_FragCoord.x / 16.0;             // (0, 0.5)
    float a = asin(u) + acos(u);                 // = pi/2
    float b = exp2(log2(u + 1.0));               // = u + 1
    float c = inversesqrt(4.0) + trunc(1.75) * 0.125;
    float d = radians(degrees(u)) + tanh(0.0) + sinh(0.0) + cosh(0.0) - 1.0;
    float e = (isnan(u) || isinf(u)) ? 1.0 : 0.0;
    fragment = vec4(a / 3.14159265, (b - 1.0), c + e, d);
}
"""
    f = _render_module(tmp_path, "trx", frag, screen=(8, 2))
    u = (np.arange(8) + 0.5) / 16.0
    np.testing.assert_allclose(f[0, :, 0], 0.5, atol=1e-5)
    np.testing.assert_allclose(f[0, :, 1], u, atol=1e-5)
    np.testing.assert_allclose(f[0, :, 2], 0.5 + 0.125, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 3], u, atol=1e-5)


def test_bitcast_roundtrip(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void main() {
    float v = gl_FragCoord.x / 8.0 + 0.5;
    int bits = floatBitsToInt(v);
    float back = intBitsToFloat(bits);
    fragment = vec4(back - 0.5, float((bits >> 23) & 255) / 255.0,
                    0.0, 1.0);
}
"""
    f = _render_module(tmp_path, "bc", frag, screen=(8, 2))
    v = ((np.arange(8) + 0.5) / 8.0 + 0.5).astype(np.float32)
    bits = v.view(np.int32)
    np.testing.assert_allclose(f[0, :, 0], v - 0.5, atol=1e-6)
    np.testing.assert_allclose(f[0, :, 1], ((bits >> 23) & 255) / 255.0,
                               atol=1e-6)
