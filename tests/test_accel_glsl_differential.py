"""Differential parity: the baked accel-path operators vs the
reference's OWN GPU pipeline shaders, interpreted.

The GPU post-FFT path (reference render.c:2119-2273) runs gravity /
averaging as 1-D fragment passes:

* ``util/gravity_pass.frag`` — ``tex[x] - diff`` after a GL_MAX-blend
  store of the new spectrum (render.c:2199-2217);
* ``util/average_pass.frag`` — an ``#expand``-generated UNROLLED sum
  over the circular history FBOs, bound NEWEST-first
  (render.c:2252-2265), weighted by the unhygienic ``window`` macro;
* ``util/pass.frag`` — the identity 1-D mapping.

glava_tpu bakes these semantics into ``pipeline.AudioPipeline``
(GL_R16 per-stage clamp, age-ordered ``windows.avg_weights``). This
suite closes the transcription trust gap the same way
test_refdsp_differential.py does for the CPU chain and
test_smooth_glsl_differential.py for smooth.glsl: the interpreter
executes the reference's ACTUAL .frag files — including ``#expand``
code generation and C-faithful (unhygienic) macro substitution — and
the results must match the baked operators.
"""

from __future__ import annotations

import pathlib

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from glava_tpu.config import glsl_expr, preprocessor
from glava_tpu.config.glsl_shader import _Exec, make_builtins, parse_shader
from glava_tpu.ops import windows

REF = pathlib.Path("/root/reference/shaders/glava")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference shader tree not available",
)

W = 768  # 1-D pass width == texture size (render.c:2137-2158)


def run_1d_pass(frag_path: pathlib.Path, textures: dict[str, np.ndarray],
                scalars: dict[str, float], defines: dict[str, str],
                w: int = W) -> np.ndarray:
    """Interpret one reference 1-D pipeline pass and return
    ``fragment.r`` along the row (the 1-D FBO contents)."""
    ctx = preprocessor.Context(system_dir=REF, user_dir=REF,
                               defines=dict(defines))
    text = preprocessor.preprocess_shader_source(
        frag_path.read_text(), ctx, fname=str(frag_path),
        current_dir=frag_path.parent)
    program = parse_shader(text)

    h = 1
    x2d = (np.arange(w, dtype=np.float32) + 0.5)[None, :]
    y2d = np.full((1, 1), 0.5, np.float32)
    variables: dict = {
        "gl_FragCoord": (x2d, y2d, 0.0, 1.0),
        "fragment": (0.0, 0.0, 0.0, 0.0),
    }
    for name, arr in textures.items():
        variables[name] = jnp.asarray(arr, jnp.float32)
    variables.update(scalars)
    builtins = make_builtins(None, w, h, w, None)
    env = glsl_expr.Env(defines=dict(ctx.defines), variables=variables,
                        pipe_values={}, functions=builtins)
    ex = _Exec(env, h, w)
    try:
        with np.errstate(all="ignore"):
            ex.bind_functions(program.funcs)
            ex.run(program.pre_body)
            ex.run(program.body)
        frag = env.variables["fragment"]
    finally:
        import glava_tpu.config.glsl_shader as _gs

        if _gs._CURRENT_EXEC is ex:
            _gs._CURRENT_EXEC = None
    r = frag[0] if isinstance(frag, tuple) else frag
    return np.asarray(jnp.broadcast_to(jnp.asarray(r), (1, w)))[0]


def test_pass_frag_is_identity():
    rng = np.random.default_rng(0)
    tex = rng.random(W).astype(np.float32)
    out = run_1d_pass(REF / "util/pass.frag", {"tex": tex}, {}, {})
    assert np.array_equal(out, tex)


def test_gravity_pass_matches_operator():
    """gravity_pass.frag + the GL_MAX-blend store + GL_R16 clamp ==
    the pipeline's clip(max(prev, spec) - g, 0, 1) (pipeline.py:
    accel_fft branch), across several updates."""
    rng = np.random.default_rng(1)
    g = np.float32(0.021)
    grav_i = np.zeros(W, np.float32)   # interpreter-driven state
    grav_o = np.zeros(W, np.float32)   # operator-driven state
    for _ in range(6):
        spec = np.clip(rng.random(W).astype(np.float32) * 0.4, 0.0, 1.0)
        stored = np.maximum(grav_i, spec)          # GL_MAX blend store
        out = run_1d_pass(REF / "util/gravity_pass.frag",
                          {"tex": stored}, {"diff": float(g)}, {})
        grav_i = np.clip(out, 0.0, 1.0)            # GL_R16 write clamp
        grav_o = np.clip(np.maximum(grav_o, spec) - g, 0.0, 1.0)
        np.testing.assert_allclose(grav_i, grav_o, atol=1e-7)


@pytest.mark.parametrize("frames,windowed", [
    (2, True),    # frames==2 force-disables windowing (frag:29-31)
    (3, True),    # WIN_FUNC 3-frame special case is DEAD code (frag:41)
    (6, True),    # shipped default curve
    (6, False),   # _AVG_WINDOW 0: plain mean
    (5, True),
])
def test_average_pass_matches_avg_weights(frames, windowed):
    """average_pass.frag executed VERBATIM — #expand generating the
    unrolled sum, `window(I, _AVG_FRAMES - 1)` expanding UNHYGIENICALLY
    so the `- 1` is a radian phase shift — against the baked
    age-ordered weights (windows.avg_weights(accel=True), the curve
    pinned by the compiled-reference differential suite)."""
    rng = np.random.default_rng(2 + frames)
    # history frames by AGE: hist_age[a] is the frame captured a
    # updates ago; the reference binds t0..tN newest-first
    # (render.c:2252-2256)
    hist_age = rng.random((frames, W)).astype(np.float32)
    textures = {f"t{i}": hist_age[i] for i in range(frames)}
    defines = {"_AVG_FRAMES": str(frames),
               "_AVG_WINDOW": "1" if windowed else "0"}
    got = run_1d_pass(REF / "util/average_pass.frag", textures, {},
                      defines)

    # operator: avg_weights is POSITIONAL oldest-first; oldest-first
    # position p holds age frames-1-p
    w = np.asarray(windows.avg_weights(frames, windowed, accel=True),
                   np.float64)
    hist_pos = hist_age[::-1]
    want = (w[:, None] * hist_pos).sum(axis=0)
    np.testing.assert_allclose(got, want, atol=3e-6, rtol=2e-6)


def test_average_pass_expand_actually_unrolled():
    """The #expand directive must EMIT code (not validate-and-drop):
    the preprocessed source contains every generated macro call."""
    ctx = preprocessor.Context(system_dir=REF, user_dir=REF,
                               defines={"_AVG_FRAMES": "4",
                                        "_AVG_WINDOW": "1"})
    text = preprocessor.preprocess_shader_source(
        (REF / "util/average_pass.frag").read_text(), ctx,
        fname="average_pass.frag", current_dir=REF / "util")
    for i in range(4):
        assert f"uniform sampler1D t{i}" in text, f"t{i} not generated"
        assert f"texelFetch(t{i}," in text, f"F({i}) not expanded"
    # unhygienic window expansion: the `- 1` must be OUTSIDE the
    # division (a phase shift), exactly like the C preprocessor
    assert "/ _AVG_FRAMES - 1)" in text


def test_expand_unknown_symbol_rejected():
    ctx = preprocessor.Context(system_dir=REF, user_dir=REF, defines={})
    with pytest.raises(preprocessor.PreprocessError,
                       match="invalid input"):
        preprocessor.preprocess_shader_source(
            "#define M(I) float x##I;\n#expand M NOT_A_SYMBOL\n",
            ctx, fname="t.frag")
