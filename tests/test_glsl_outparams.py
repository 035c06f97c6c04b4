"""GLSL `out`/`inout` function parameters in the shader interpreter:
copy-out semantics to the caller's argument lvalue, merged under the
call-site pixel mask (the form the reference's fft_common.glsl helpers
use, e.g. `void butterfly(inout uvec4 a, ...)`)."""

import numpy as np
import jax.numpy as jnp
import pytest

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer


def _render_module(tmp_path, name, frag, screen=(8, 4), n=2):
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


def test_out_param_writes_back(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void setc(out vec3 c, float v) { c = vec3(v, v * 0.5, 0.25); }
void main() {
    vec3 col = vec3(0.0, 0.0, 0.0);
    setc(col, 0.5);
    fragment = vec4(col, 1.0);
}
"""
    f = _render_module(tmp_path, "op", frag)
    np.testing.assert_allclose(f[..., 0], 0.5, atol=1e-6)
    np.testing.assert_allclose(f[..., 1], 0.25, atol=1e-6)
    np.testing.assert_allclose(f[..., 2], 0.25, atol=1e-6)


def test_inout_accumulates_through_loop(tmp_path):
    """inout param mutated inside a statically-unrolled loop."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void bump(inout float x, float d) { x += d; }
void main() {
    float acc = 0.0;
    for (int i = 0; i < 4; i += 1) bump(acc, 0.125);
    fragment = vec4(acc, 0, 0, 1);
}
"""
    f = _render_module(tmp_path, "io", frag)
    np.testing.assert_allclose(f[..., 0], 0.5, atol=1e-6)


def test_out_param_masked_at_call_site(tmp_path):
    """Write-back merges under the call-site pixel mask."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void setv(out float v) { v = 1.0; }
void main() {
    float x = 0.25;
    if (gl_FragCoord.x < 4.0) setv(x);
    fragment = vec4(x, 0, 0, 1);
}
"""
    f = _render_module(tmp_path, "om", frag)
    np.testing.assert_allclose(f[0, :4, 0], 1.0, atol=1e-6)
    np.testing.assert_allclose(f[0, 4:, 0], 0.25, atol=1e-6)


def test_inout_struct_field_argument(tmp_path):
    """Write-back through a member-chain argument lvalue."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
struct M { vec3 c; float g; };
void dim(inout float x) { x *= 0.5; }
void main() {
    M m = M(vec3(0.5, 1.0, 0.0), 0.8);
    dim(m.g);
    dim(m.c.y);
    fragment = vec4(m.c, m.g);
}
"""
    f = _render_module(tmp_path, "os", frag)
    np.testing.assert_allclose(f[..., 1], 0.5, atol=1e-6)
    np.testing.assert_allclose(f[..., 3], 0.4, atol=1e-6)


def test_inout_rides_while_carry(tmp_path):
    """A caller variable written ONLY via an inout argument inside a
    data-dependent while loop must ride the loop carry."""
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void bump(inout float x) { x += 1.0; }
void main() {
    float acc = 0.0;
    float i = 0.0;
    while (i < gl_FragCoord.x + 0.5) {
        bump(acc);
        i += 1.0;
    }
    fragment = vec4(acc / 16.0, 0, 0, 1);
}
"""
    f = _render_module(tmp_path, "ow", frag)
    np.testing.assert_allclose(f[0, :, 0], (np.arange(8) + 1) / 16.0,
                               atol=1e-6)


def test_out_param_rejects_expression_argument(tmp_path):
    frag = """
in vec4 gl_FragCoord;
out vec4 fragment;
void setv(out float v) { v = 1.0; }
void main() {
    float x = 0.0;
    setv(x + 1.0);
    fragment = vec4(x, 0, 0, 1);
}
"""
    from glava_tpu.config.glsl_shader import ShaderError
    with pytest.raises(ShaderError, match="must be a variable"):
        _render_module(tmp_path, "oe", frag)
