"""Module knob-variant coverage: every documented knob combination
renders a valid frame (the reference compiles these as shader variants;
here they are distinct traced programs)."""

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

VARIANTS = [
    # (module, screen, user knob file content)
    ("bars", (128, 96), "#define FLIP 1\n"),
    ("bars", (128, 96), "#define MIRROR_YX 1\n"),
    ("bars", (96, 128), "#define MIRROR_YX 1\n#define FLIP 1\n"),
    ("bars", (128, 96), "#define DIRECTION 1\n"),
    ("bars", (128, 96), "#define INVERT 1\n"),
    ("bars", (128, 96), "#define BAR_OUTLINE_WIDTH 0\n"),
    ("bars", (128, 96), "#define USE_ALPHA 1\n"),
    ("graph", (128, 96), "#define DRAW_OUTLINE 1\n#define DRAW_HIGHLIGHT 0\n"),
    ("graph", (128, 96), "#define ANTI_ALIAS 1\n"),
    ("graph", (128, 96), "#define JOIN_CHANNELS 1\n"),
    ("graph", (128, 96), "#define INVERT 1\n"),
    ("graph", (128, 96), "#define DIRECTION -1\n"),
    ("radial", (300, 300), "#define BAR_OUTLINE_WIDTH 2\n"),
    ("radial", (300, 300), "#define INVERT 1\n#define ROTATE 0\n"),
    ("circle", (300, 300), "#define C_FILL 1\n"),
    ("circle", (300, 300), "#define C_SMOOTH 0\n"),
    ("wave", (128, 96), "#define MIN_THICKNESS 2\n#define MAX_THICKNESS 10\n"),
]


@pytest.mark.parametrize("module,screen,knobs", VARIANTS,
                         ids=[f"{m}-{i}" for i, (m, _, __) in enumerate(VARIANTS)])
def test_variant_renders(tmp_path, module, screen, knobs):
    (tmp_path / "rc.glsl").write_text(
        f"#request mod {module}\n"
        f"#request setgeometry 0 0 {screen[0]} {screen[1]}\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    (tmp_path / f"{module}.glsl").write_text(knobs)
    lc = loader.load(user_dir=tmp_path)
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(3)
    snap = jnp.asarray(
        rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3
    )
    for _ in range(6):
        state, frame = step(state, snap, True, np.float32(0.1),
                            np.float32(1.0), np.float32(0.05), {})
    f = np.asarray(frame)
    assert f.shape == (screen[1], screen[0], 4)
    assert np.isfinite(f).all()
    assert f.min() >= 0.0 and f.max() <= 1.0
    assert (f[..., 3] > 0).any(), "variant drew nothing"


def test_graph_antialias_feathers_edges(tmp_path):
    """ANTI_ALIAS adds partial-alpha pixels along the graph border."""

    def render(aa):
        (tmp_path / "rc.glsl").write_text(
            "#request mod graph\n#request setgeometry 0 0 128 96\n"
            "#request setbufsize 1024\n#request setsamplesize 256\n"
            "#request setprintframes false\n"
        )
        (tmp_path / "graph.glsl").write_text(
            f"#define ANTI_ALIAS {aa}\n#define DRAW_HIGHLIGHT 0\n"
        )
        lc = loader.load(user_dir=tmp_path)
        r = Renderer(lc)
        state = r.init_state()
        step = r.jit_step()
        rng = np.random.default_rng(3)
        snap = jnp.asarray(
            rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3
        )
        for _ in range(6):
            state, frame = step(state, snap, True, np.float32(0.1),
                                np.float32(1.0), np.float32(0.05), {})
        return np.asarray(frame)

    plain = render(0)
    aa = render(1)
    partial_plain = ((plain[..., 3] > 0) & (plain[..., 3] < 1)).sum()
    partial_aa = ((aa[..., 3] > 0) & (aa[..., 3] < 1)).sum()
    assert partial_aa > partial_plain


def test_graph_antialias_inverted(tmp_path):
    """AA + INVERT renders sane feathered output (d = h - y row math)."""
    (tmp_path / "rc.glsl").write_text(
        "#request mod graph\n#request setgeometry 0 0 128 96\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    (tmp_path / "graph.glsl").write_text(
        "#define ANTI_ALIAS 1\n#define INVERT 1\n#define DRAW_HIGHLIGHT 0\n"
    )
    lc = loader.load(user_dir=tmp_path)
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(3)
    snap = jnp.asarray(
        rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3
    )
    for _ in range(6):
        state, frame = step(state, snap, True, np.float32(0.1),
                            np.float32(1.0), np.float32(0.05), {})
    f = np.asarray(frame)
    assert np.isfinite(f).all()
    # inverted graph hangs from the top: content in the upper half
    assert (f[f.shape[0] // 2:, :, 3] > 0).any()
    assert ((f[..., 3] > 0) & (f[..., 3] < 1)).any()  # feathered pixels


# ---------------------------------------------------------------------------
# circle fused scalar-field chain vs the literal three-pass form: the
# fused path (GLAVA_TPU_CIRCLE_SCALAR=1, the default) runs the whole
# mask -> smooth -> premultiply chain on one (H, W) plane; it must match
# the literal pass list across every gating branch (smooth on/off, fill,
# premultiply on/off, zero-alpha outline).
# ---------------------------------------------------------------------------

CIRCLE_FUSED_VARIANTS = [
    ("default", "", "native"),
    ("fill", "#define C_FILL 1\n", "native"),
    ("nosmooth", "#define C_SMOOTH 0\n", "native"),
    ("nopremult", "", "none"),
    ("alpha0", "#define OUTLINE #33333300\n", "native"),
    ("alpha0-nopremult", "#define OUTLINE #33333300\n", "none"),
]


@pytest.mark.parametrize("name,knobs,opacity", CIRCLE_FUSED_VARIANTS,
                         ids=[v[0] for v in CIRCLE_FUSED_VARIANTS])
def test_circle_fused_scalar_matches_literal(tmp_path, monkeypatch, name,
                                             knobs, opacity):
    def render(scalar):
        monkeypatch.setenv("GLAVA_TPU_CIRCLE_SCALAR", scalar)
        (tmp_path / "rc.glsl").write_text(
            "#request mod circle\n#request setgeometry 0 0 300 300\n"
            f"#request setopacity {opacity}\n"
            "#request setbufsize 1024\n#request setsamplesize 256\n"
            "#request setprintframes false\n"
        )
        (tmp_path / "circle.glsl").write_text(knobs)
        lc = loader.load(user_dir=tmp_path)
        r = Renderer(lc)
        state = r.init_state()
        step = r.jit_step()
        rng = np.random.default_rng(7)
        snap = jnp.asarray(
            rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3
        )
        for _ in range(6):
            state, frame = step(state, snap, True, np.float32(0.1),
                                np.float32(1.0), np.float32(0.05), {})
        return np.asarray(frame)

    fused = render("1")
    literal = render("0")
    assert (literal[..., 3] > 0).any() or name.startswith("alpha0")
    np.testing.assert_allclose(fused, literal, atol=2e-6)


# ---------------------------------------------------------------------------
# Interpreter-vs-native PARITY over the documented knob matrix: each
# module's verbatim reference .frag files run through the GLSL
# interpreter with the knob override and must match the native jnp
# module pixel-for-pixel (tolerances as in test_glsl_shader's verbatim
# suite). Every knob documented in bars.glsl / radial.glsl / graph.glsl
# is exercised at a non-default value at least once.
# ---------------------------------------------------------------------------

PARITY_MATRIX = [
    # bars.glsl knobs
    ("bars", (128, 96), 0.002, "#define BAR_WIDTH 3\n#define BAR_GAP 2\n"),
    ("bars", (128, 96), 0.002,
     "#define BAR_OUTLINE_WIDTH 2\n#define AMPLIFY 200\n"),
    ("bars", (128, 96), 0.002, "#define USE_ALPHA 1\n"),
    ("bars", (128, 96), 0.002, "#define DIRECTION 1\n#define INVERT 1\n"),
    ("bars", (96, 128), 0.002, "#define FLIP 1\n#define MIRROR_YX 1\n"),
    ("bars", (128, 96), 0.002, "#define GRADIENT 40\n#define C_LINE 2\n"),
    ("bars", (128, 96), 0.002,
     "#define DISABLE_MONO 1\n#define COLOR #ff3344\n"),
    # radial.glsl knobs
    ("radial", (200, 200), 0.002,
     "#define C_RADIUS 40\n#define NBARS 96\n#define BAR_WIDTH 3.0\n"),
    ("radial", (200, 200), 0.002, "#define ROTATE 0.5\n#define INVERT 1\n"),
    ("radial", (200, 200), 0.002,
     "#define BAR_OUTLINE_WIDTH 2\n#define AMPLIFY 200\n"),
    ("radial", (200, 200), 0.002,
     "#define CENTER_OFFSET_X 10\n#define CENTER_OFFSET_Y -8\n"
     "#define C_LINE 1\n"),
    ("radial", (200, 200), 0.002,
     "#define BAR_ALIAS_FACTOR 2.0\n#define C_ALIAS_FACTOR 1.0\n"
     "#define GRADIENT 50\n"),
    # graph.glsl knobs
    ("graph", (128, 96), 0.02, "#define VSCALE 200\n#define DIRECTION -1\n"),
    ("graph", (128, 96), 0.02,
     "#define DRAW_OUTLINE 1\n#define DRAW_HIGHLIGHT 0\n"),
    ("graph", (128, 96), 0.02,
     "#define JOIN_CHANNELS 1\n#define GRADIENT 40\n"),
    ("graph", (128, 96), 0.02, "#define INVERT 1\n#define ANTI_ALIAS 1\n"),
]


@pytest.mark.parametrize(
    "module,screen,px_tol,knobs", PARITY_MATRIX,
    ids=[f"{m}-{k.split()[1]}" for m, _, __, k in PARITY_MATRIX])
def test_knob_variant_matches_verbatim_shader(tmp_path, module, screen,
                                              px_tol, knobs):
    from tests.test_glsl_shader import _compare_verbatim

    a, b = _compare_verbatim(tmp_path, module, screen, knobs=knobs)
    assert (a[..., 3] > 0).any(), "variant drew nothing"
    frac = (np.abs(a - b).max(axis=-1) > 1 / 255).mean()
    assert frac <= px_tol, f"{frac:.4%} pixels deviate"
