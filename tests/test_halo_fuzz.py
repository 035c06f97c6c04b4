"""Neighbor-tap differential fuzz: the shared-halo fetch fast path.

Random two-pass shaders tap prev at integer offsets in [-3, 3] —
covering the zero-halo qualify region (pure shifts, |d| <= 2), clamp0
patterns (x - 1 at half-integer centers truncates toward zero), and
the general-fetch fallback (offsets beyond the halo, -2 at the border
producing -1 indices). Each program is pinned two ways:

1. GLAVA_TPU_PREV_HALO=zero vs =0 (per-tap concat path) BIT-exact;
2. against the per-pixel scalar oracle (GL truncation + out-of-bounds
   reads black) at sampled pixels.
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.render.base import PassInputs
from glava_tpu.renderer import Renderer
from tests.scalar_oracle import ScalarExec

PASS1 = """
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
    if (gl_FragCoord.y < v) {
        fragment = vec4(0.2 + 0.6 * (gl_FragCoord.x / screen.x),
                        0.7, 1.0 - gl_FragCoord.y / screen.y, 1.0);
    } else {
        fragment = vec4(0, 0, 0, 0);
    }
}
"""


def gen_tap_frag(rng):
    n = int(rng.integers(2, 6))
    taps = []
    for _ in range(n):
        dx = int(rng.integers(-3, 4))
        dy = int(rng.integers(-3, 4))
        if rng.random() < 0.3:
            # normalized texture() tap: NEAREST + GL_REPEAT — the
            # 'wrap' axis pattern (rolls, not gathers)
            taps.append(
                f"texture(tex, vec2((gl_FragCoord.x + ({dx}.0)) / "
                f"screen.x, (gl_FragCoord.y + ({dy}.0)) / screen.y))")
        else:
            taps.append(
                f"texelFetch(tex, ivec2(gl_FragCoord.x + {dx}, "
                f"gl_FragCoord.y + {dy}), 0)")
    body = " + ".join(taps)
    return f"""
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;
void main() {{
    fragment = ({body}) * {1.0 / n:.6f};
}}
"""


def _render_pair(tmp_path, frag2, halo, mat=None):
    d = tmp_path / ("h" + halo + (mat or ""))
    mod = d / "eq"
    mod.mkdir(parents=True)
    (mod / "1.frag").write_text(PASS1)
    (mod / "2.frag").write_text(frag2)
    (d / "rc.glsl").write_text(
        "#request mod eq\n#request setgeometry 0 0 40 28\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    old = os.environ.get("GLAVA_TPU_PREV_HALO")
    oldm = os.environ.get("GLAVA_TPU_PREV_MAT")
    os.environ["GLAVA_TPU_PREV_HALO"] = halo
    if mat is not None:
        os.environ["GLAVA_TPU_PREV_MAT"] = mat
    try:
        lc = loader.load(user_dir=d)
        r = Renderer(lc)
        rng = np.random.default_rng(5)
        snap = jnp.asarray(
            rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32)
            * 0.3)
        g = jnp.float32(lc.cfg.gravity_step / lc.cfg.nominal_ups)
        chains = r.pipeline.advance(r.init_state().chains, snap[0],
                                    snap[1], gravity_g=g)
        textures = r.pipeline.textures_from(chains, snap[0], snap[1])
        from glava_tpu.render.base import as_planes, clip_planes, interleave
        outs = []
        out = None
        w, h = r.screen
        for fn in r.module.passes:
            out = clip_planes(as_planes(
                fn(PassInputs(out, textures, jnp.float32(0.1)))))
            outs.append(np.asarray(interleave(out, h, w)))
        tex_np = {k: np.asarray(v) for k, v in textures.items()}
        return r, outs, tex_np
    finally:
        if old is None:
            os.environ.pop("GLAVA_TPU_PREV_HALO", None)
        else:
            os.environ["GLAVA_TPU_PREV_HALO"] = old
        if mat is not None:
            if oldm is None:
                os.environ.pop("GLAVA_TPU_PREV_MAT", None)
            else:
                os.environ["GLAVA_TPU_PREV_MAT"] = oldm


@pytest.mark.parametrize("seed", range(12))
def test_random_taps_halo_vs_concat_vs_oracle(tmp_path, seed):
    rng = np.random.default_rng(7000 + seed)
    frag2 = gen_tap_frag(rng)
    _, outs_halo, _ = _render_pair(tmp_path, frag2, "zero")
    r, outs_off, tex_np = _render_pair(tmp_path, frag2, "0")
    assert np.array_equal(outs_halo[1], outs_off[1]), (
        f"seed {seed}: halo fetch diverges from the concat path "
        f"(max {np.abs(outs_halo[1] - outs_off[1]).max()})\n{frag2}")
    # the tap-source materialization barrier must be value-identity
    _, outs_mat, _ = _render_pair(tmp_path, frag2, "zero", mat="1")
    assert np.array_equal(outs_mat[1], outs_halo[1]), (
        f"seed {seed}: PREV_MAT=1 diverges\n{frag2}")
    fn = r.module.passes[1]
    sz = tex_np[next(iter(tex_np))].shape[-1]
    for x in (0, 1, 3, 20, 38, 39):
        for y in (0, 1, 14, 26, 27):
            ex = ScalarExec(fn.program, x=x, y=y, textures=tex_np,
                            prev=outs_off[0], screen=(40, 28), sz=sz,
                            defines=fn.defines, uniforms=fn.uniforms)
            got = np.clip(np.asarray(ex.run_main(), np.float64), 0.0, 1.0)
            want = outs_off[1][y, x].astype(np.float64)
            assert np.allclose(got, want, atol=2e-6), (
                f"seed {seed} pixel ({x},{y}): oracle {got} vs "
                f"vectorized {want}\n{frag2}")
