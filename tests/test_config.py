"""Config-language tests: preprocessor, requests, colors, expressions."""

import numpy as np
import pytest

from glava_tpu.config import glsl_expr, loader, preprocessor
from glava_tpu.config.colors import parse_color
from glava_tpu.config.requests import RequestError
from glava_tpu.config.state import RenderConfig


# ---------------------------------------------------------------------------
# colors (glsl_ext.c:88-122 semantics)
# ---------------------------------------------------------------------------

def test_parse_color_variants():
    assert parse_color("ffffffff") == (1.0, 1.0, 1.0, 1.0)
    assert parse_color("ff0000") == (1.0, 0.0, 0.0, 1.0)
    r, g, b, a = parse_color("55000055")
    assert abs(r - 0x55 / 255) < 1e-9 and g == 0 and b == 0 and abs(a - 0x55 / 255) < 1e-9
    assert parse_color("0xff0000") == (1.0, 0.0, 0.0, 1.0)
    assert parse_color("zz") is None
    # trailing incomplete component ignored
    assert parse_color("ff0") == (1.0, 0.0, 0.0, 1.0)


# ---------------------------------------------------------------------------
# preprocessor
# ---------------------------------------------------------------------------

def _run(text, **kw):
    seen = []
    ctx = preprocessor.Context(
        on_request=lambda n, a, f, l: seen.append((n, a)), **kw
    )
    preprocessor.process_text(text, ctx)
    return seen, ctx


def test_request_tokenizing_with_quotes():
    seen, _ = _run('#request settitle "two words"\n#request setswap 1')
    assert seen == [("settitle", ["two words"]), ("setswap", ["1"])]


def test_requests_in_comments_ignored():
    seen, _ = _run("// #request setswap 1\n/* \n#request setswap 2\n*/\n")
    assert seen == []


def test_define_last_wins_and_function_macros_skipped():
    _, ctx = _run("#define A 1\n#define A 2\n#define F(x) (x*2)\n")
    assert ctx.defines["A"] == "2"
    assert "F" not in ctx.defines


def test_include_roots(tmp_path):
    sysd = tmp_path / "sys"
    usrd = tmp_path / "usr"
    sysd.mkdir(), usrd.mkdir()
    (sysd / "inc.glsl").write_text("#define FROM_SYS 1\n")
    (usrd / "inc.glsl").write_text("#define FROM_USR 1\n")
    seen = []
    ctx = preprocessor.Context(
        system_dir=sysd, user_dir=usrd,
        on_request=lambda n, a, f, l: seen.append(n),
    )
    preprocessor.process_text('#include "@inc.glsl"\n#include ":inc.glsl"\n', ctx)
    assert "FROM_SYS" in ctx.defines and "FROM_USR" in ctx.defines


def test_expand_validation():
    with pytest.raises(preprocessor.PreprocessError):
        _run("#expand F _BOGUS\n")
    _run("#expand F _AVG_FRAMES\n")  # valid symbol, no-op


def test_ifdef_guard():
    _, ctx = _run("#ifndef G\n#define G 1\n#define X 5\n#endif\n#ifndef G\n#define Y 6\n#endif\n")
    assert ctx.defines.get("X") == "5"
    assert "Y" not in ctx.defines


# ---------------------------------------------------------------------------
# requests -> RenderConfig
# ---------------------------------------------------------------------------

def test_request_execution():
    from glava_tpu.config import requests

    cfg = RenderConfig()
    requests.execute(cfg, "setbufsize", ["8192"])
    requests.execute(cfg, "setopacity", ["xroot"])
    requests.execute(cfg, "setgeometry", ["0", "0", "512", "256"])
    requests.execute(cfg, "setgravitystep", ["6.0"])
    requests.execute(cfg, "setmirror", ["true"])
    assert cfg.bufsize == 8192
    assert cfg.copy_desktop and not cfg.premultiply_alpha
    assert cfg.geometry == (0, 0, 512, 256)
    assert cfg.gravity_step == 6.0
    assert cfg.mirror_input

    with pytest.raises(RequestError):
        requests.execute(cfg, "notarequest", [])
    with pytest.raises(RequestError):
        requests.execute(cfg, "setmirror", ["yes"])
    with pytest.raises(RequestError):
        requests.execute(cfg, "setopacity", ["bogus"])


# ---------------------------------------------------------------------------
# expression evaluator
# ---------------------------------------------------------------------------

def test_expr_arithmetic_and_colors():
    env = glsl_expr.Env(defines={"GRADIENT": "80"}, variables={"PI": np.pi})
    assert glsl_expr.evaluate("1 + 2 * 3", env) == 7
    assert abs(glsl_expr.evaluate("(PI / 2)", env) - np.pi / 2) < 1e-9
    c = glsl_expr.evaluate("#3366b2", env)
    assert abs(c[0] - 0x33 / 255) < 1e-9 and abs(c[2] - 0xb2 / 255) < 1e-9
    v = glsl_expr.evaluate("vec4(1, 0, 0, float(1) / float(3))", env)
    assert v[3] == pytest.approx(1 / 3)


def test_expr_mix_clamp_swizzle():
    env = glsl_expr.Env(defines={
        "GRADIENT": "80",
        "COLOR": "mix(#3366b2, #a0a0b2, clamp(d / GRADIENT, 0, 1))",
        "BAR_OUTLINE": "vec4(COLOR.rgb * 1.5, COLOR.a)",
    }, variables={"d": 40.0})
    c = env.lookup("COLOR")
    lo, hi = 0x33 / 255, 0xa0 / 255
    assert c[0] == pytest.approx(lo + (hi - lo) * 0.5)
    o = env.lookup("BAR_OUTLINE")
    assert o[0] == pytest.approx(c[0] * 1.5)
    assert o[3] == pytest.approx(c[3])


def test_expr_pipe_binds():
    env = glsl_expr.Env(variables={"d": 1.0})
    # default used when not bound
    v = glsl_expr.evaluate("@fg:vec4(0.7, 0.2, 0.45, 1)", env)
    assert v[0] == pytest.approx(0.7)
    # bound value wins, default skipped
    env2 = glsl_expr.Env(pipe_values={"fg": (1.0, 1.0, 1.0, 1.0)})
    v2 = glsl_expr.evaluate("@fg:vec4(0.7, 0.2, 0.45, 1)", env2)
    assert v2 == (1.0, 1.0, 1.0, 1.0)
    # unbound without default errors (glsl_ext.c:584-586)
    with pytest.raises(glsl_expr.ExprError):
        glsl_expr.evaluate("@nope", env)


def test_expr_per_pixel_array():
    import jax.numpy as jnp

    env = glsl_expr.Env(
        defines={"GRADIENT": "80",
                 "COLOR": "mix(#000000, #ffffff, clamp(d / GRADIENT, 0, 1))"},
        variables={"d": jnp.asarray([0.0, 40.0, 200.0])},
    )
    c = env.lookup("COLOR")
    arr = np.asarray(glsl_expr.to_rgba(c))
    assert arr.shape == (3, 4)
    np.testing.assert_allclose(arr[:, 0], [0.0, 0.5, 1.0], atol=1e-6)


# ---------------------------------------------------------------------------
# loader end-to-end
# ---------------------------------------------------------------------------

def test_loader_defaults():
    lc = loader.load()
    assert lc.module == "bars"
    assert lc.cfg.bufsize == 4096 and lc.cfg.sample_rate == 22050
    assert lc.cfg.avg_frames == 5  # smooth_parameters.glsl overrides 6
    assert "BAR_WIDTH" in lc.defines and "SAMPLE_MODE" in lc.defines


def test_loader_user_overrides(tmp_path):
    (tmp_path / "rc.glsl").write_text(
        '#request mod wave\n#request setbufsize 2048\n'
    )
    (tmp_path / "wave.glsl").write_text("#define AMPLIFY 123\n")
    lc = loader.load(user_dir=tmp_path)
    assert lc.module == "wave"
    assert lc.cfg.bufsize == 2048
    assert lc.defines["AMPLIFY"] == "123"


def test_loader_cli_requests_and_force_module():
    lc = loader.load(cli_requests=('setframerate 30',), force_module="graph")
    assert lc.cfg.framerate == 30
    assert lc.module == "graph"


def test_loader_desktop_presets():
    lc = loader.load(desktop=True, wm_name="Xfwm4")
    assert lc.cfg.xwintype == "desktop"
    assert "pinned" in lc.cfg.xwinstates and "below" in lc.cfg.xwinstates
    lc2 = loader.load(desktop=True, wm_name="UnknownWM")
    assert lc2.cfg.xwintype == "desktop"  # env_default fallback


def test_loader_test_entry():
    lc = loader.load(entry="test_rc.glsl")
    assert lc.module == "test"
    assert lc.cfg.test_eval_color is not None
    r, g, b, a = lc.cfg.test_eval_color
    assert r == pytest.approx(0x55 / 255) and a == pytest.approx(0x55 / 255)


def test_user_python_module(tmp_path):
    """User modules: <config>/modules/<name>.py self-register and load
    with their knob files (render.c:1488-1597 extensibility analogue)."""
    import shutil

    (tmp_path / "modules").mkdir()
    shutil.copy("docs/examples/vu_meter.py", tmp_path / "modules" / "vu_meter.py")
    (tmp_path / "rc.glsl").write_text(
        "#request mod vu_meter\n#request setgeometry 0 0 64 48\n"
    )
    (tmp_path / "vu_meter.glsl").write_text("#define METER_COLOR #ff00ff\n")
    lc = loader.load(user_dir=tmp_path)
    assert lc.module == "vu_meter"
    assert lc.defines["METER_COLOR"] == "#ff00ff"

    import numpy as np
    import jax.numpy as jnp
    from glava_tpu.renderer import Renderer

    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step(quantize=True)
    snap = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, lc.cfg.bufsize))
        .astype(np.float32) * 0.3
    )
    for _ in range(6):
        state, frame = step(state, snap, True, np.float32(0.0),
                            np.float32(1.0), np.float32(0.05), {})
    f = np.asarray(frame)
    drawn = f[f[..., 3] > 0]
    assert drawn.size


def test_expr_step_smoothstep_fract():
    env = glsl_expr.Env()
    assert glsl_expr.evaluate("step(0.5, 0.7)", env) == 1.0
    assert glsl_expr.evaluate("step(0.5, 0.3)", env) == 0.0
    assert glsl_expr.evaluate("fract(2.75)", env) == pytest.approx(0.75)
    s = glsl_expr.evaluate("smoothstep(0.0, 1.0, 0.5)", env)
    assert s == pytest.approx(0.5)
    assert glsl_expr.evaluate("smoothstep(0.0, 1.0, 2.0)", env) == 1.0
    # ternary + comparisons
    assert glsl_expr.evaluate("3 > 2 ? 10 : 20", env) == 10
    assert glsl_expr.evaluate("mod(7.5, 2.0)", env) == pytest.approx(1.5)


def test_expr_vectorized_logic():
    import jax.numpy as jnp

    env = glsl_expr.Env(variables={"x": jnp.asarray([0.0, 1.0, 2.0])})
    v = glsl_expr.evaluate("x > 0.5 && x < 1.5", env)
    assert list(np.asarray(v)) == [False, True, False]
    v2 = glsl_expr.evaluate("x < 0.5 || x > 1.5", env)
    assert list(np.asarray(v2)) == [True, False, True]
    v3 = glsl_expr.evaluate("x > 0.5 ? 1.0 : 0.0", env)
    np.testing.assert_allclose(np.asarray(v3), [0.0, 1.0, 1.0])
