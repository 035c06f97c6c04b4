"""Randomized differential for the walk fast paths.

Generates seeded-random boundary-walk shaders across the lowering
decision space — direction, break adjust, start offset, column shift,
loop bound, predicate, optional extra carried state, optional
fetch-at-walk-result — and pins the fast lowerings (walk-shift
dynamic slices, first-hit scans, interpreted latch) BIT-EXACT against
the general masked lax.while_loop (GLAVA_TPU_WALK_SHIFT=0).

The fixed-case differentials in test_glsl_shader.py pin the known
idioms; this sweep guards the detector's edges (reject-vs-accept
boundaries must agree with the general path either way).
"""

import os

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

BASE = """
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
    float pos = gl_FragCoord.x / screen.x;
    float v = smooth_audio(audio_l, audio_sz, pos) * 220.0;
    if (gl_FragCoord.y < v) {
        fragment = vec4(0.1 + pos * 0.8, 0.5, 1.0 - pos, 1.0);
    } else {
        fragment = vec4(0, 0, 0, 0);
    }
}
"""


def gen_walk_frag(rng):
    d = int(rng.choice([1, -1, 2, -2]))  # incl. |d|>1 strides
    adj = int(rng.choice([0, 1, -1, 2]))
    startoff = int(rng.choice([0, 1, -1, 2]))
    colshift = int(rng.choice([-2, -1, 0, 1, 2]))
    pred = rng.choice(["f.a <= 0", "f.a > 0", "f.r > 0.2", "f.g < 0.25",
                       # compound predicates (round-5 widening): the
                       # detector must either lower these exactly or
                       # reject to the general loop — both compare
                       "f.a <= 0 || f.r > 0.8",
                       "f.a > 0 && f.g < 0.6"])
    if d > 0:
        bound = rng.choice(["y < screen.y", "y < screen.y + 5",
                            "y < screen.y - 3"])
    else:
        bound = rng.choice(["y >= 0", "y >= -3", "y >= 2"])
    extra_carry = bool(rng.random() < 0.3)
    cond_carry = bool(rng.random() < 0.25)  # carry updated under an if
    fetch_after = bool(rng.random() < 0.5)
    fetch_shift2 = int(rng.choice([-1, 0, 1]))

    brk = "break;" if adj == 0 else f"y += {adj}; break;"
    carry_decl = "float acc = 0.0;" if (extra_carry or cond_carry) else ""
    carry_step = "acc += f.r;" if extra_carry else ""
    if cond_carry:
        carry_step += " if (f.g > 0.3) { acc += 0.125; }"
    carry_out = "acc / 32.0" if (extra_carry or cond_carry) else "0.0"
    after = (f"vec4 g = texelFetch(tex, ivec2(gl_FragCoord.x + "
             f"{fetch_shift2}, y), 0);" if fetch_after
             else "vec4 g = vec4(0, 0, 0, 0);")
    return f"""
in vec4 gl_FragCoord;
#request uniform "screen" screen
uniform ivec2 screen;
#request uniform "prev" tex
uniform sampler2D tex;
out vec4 fragment;

void main() {{
    float y = gl_FragCoord.y + {startoff};
    {carry_decl}
    while ({bound}) {{
        vec4 f = texelFetch(tex, ivec2(gl_FragCoord.x + {colshift}, y), 0);
        if ({pred}) {{ {brk} }}
        {carry_step}
        y += {d};
    }}
    {after}
    fragment = vec4(clamp(y / screen.y, -1.0, 2.0) * 0.25 + 0.5,
                    g.r, g.a, clamp({carry_out} + 0.5, 0.0, 1.0));
}}
"""


def render(tmp_path, sub, frag2, fast, latch):
    d = tmp_path / sub
    mod = d / "eq"
    mod.mkdir(parents=True)
    (mod / "1.frag").write_text(BASE)
    (mod / "2.frag").write_text(frag2)
    (d / "rc.glsl").write_text(
        "#request mod eq\n#request setgeometry 0 0 48 36\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    old_shift = os.environ.get("GLAVA_TPU_WALK_SHIFT")
    old_latch = os.environ.get("GLAVA_TPU_LATCH")
    os.environ["GLAVA_TPU_WALK_SHIFT"] = "1" if fast else "0"
    if fast and latch:
        os.environ["GLAVA_TPU_LATCH"] = "interpret"
    else:
        os.environ["GLAVA_TPU_LATCH"] = "0"
    try:
        lc = loader.load(user_dir=d)
        r = Renderer(lc)
        state = r.init_state()
        step = r.jit_step()
        rng = np.random.default_rng(11)
        snap = jnp.asarray(
            rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3)
        for _ in range(2):
            state, frame = step(state, snap, True, np.float32(0.0),
                                np.float32(1.0), np.float32(0.05), {})
        return np.asarray(frame)
    finally:
        for k, v in (("GLAVA_TPU_WALK_SHIFT", old_shift),
                     ("GLAVA_TPU_LATCH", old_latch)):
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def _fuzz_n(default: int = 24) -> int:
    """CI runs a fixed seeded subset; GLAVA_TPU_FUZZ_N deepens."""
    try:
        return int(os.environ.get("GLAVA_TPU_FUZZ_N", default))
    except ValueError:
        return default


@pytest.mark.parametrize("seed", range(_fuzz_n()))
def test_random_walk_shader_fast_paths_bit_exact(tmp_path, seed):
    rng = np.random.default_rng(1000 + seed)
    frag2 = gen_walk_frag(rng)
    latch = bool(rng.random() < 0.5)
    fast = render(tmp_path, "fast", frag2, True, latch)
    slow = render(tmp_path, "slow", frag2, False, False)
    assert np.array_equal(fast, slow), (
        f"seed {seed}: fast-path output diverges from the general "
        f"lowering (max diff {np.abs(fast - slow).max()});\n{frag2}"
    )
