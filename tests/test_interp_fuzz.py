"""Random-program differential: vectorized executor vs scalar oracle.

A seeded generator composes shaders from the interpreter's statement
grammar — nested if/else, bounded while with break/continue, switch
with fallthrough, arrays with dynamic indexing, vec swizzles, helper
functions with early returns and inout params, structs — around
per-pixel data (gl_FragCoord, smooth_audio). Each program renders
through the masked-plane executor and is re-executed per pixel by the
independent scalar oracle; outputs must agree everywhere sampled.

The expression grammar avoids unbounded amplification and division by
near-zero so f32-vs-f64 drift stays inside the comparison tolerance;
every generated program is valid GLSL-subset by construction.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.render.base import PassInputs
from glava_tpu.renderer import Renderer
from tests.scalar_oracle import ScalarExec

HEADER = """
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


class Gen:
    def __init__(self, rng):
        self.rng = rng
        self.floats = ["px", "py", "v"]
        self.n = 0

    def fresh(self):
        self.n += 1
        return f"t{self.n}"

    def expr(self, depth=0):
        r = self.rng
        if depth > 2 or r.random() < 0.3:
            if r.random() < 0.5 and self.floats:
                return str(r.choice(self.floats))
            return f"{r.uniform(-1.5, 1.5):.3f}"
        kind = r.integers(0, 8)
        a, b = self.expr(depth + 1), self.expr(depth + 1)
        if kind == 0:
            return f"({a} + {b})"
        if kind == 1:
            return f"({a} - {b})"
        if kind == 2:
            return f"({a} * {b} * 0.5)"
        if kind == 3:
            return f"min({a}, {b})"
        if kind == 4:
            return f"abs({a})"
        if kind == 5:
            # geometric builtins stay bounded: length of a clamped vec
            return (f"(length(vec2(clamp({a}, -2.0, 2.0), "
                    f"clamp({b}, -2.0, 2.0))) * 0.25)")
        if kind == 6:
            return (f"(dot(normalize(vec2(1.0, 2.0)), "
                    f"vec2(clamp({a}, -2.0, 2.0), 0.5)) * 0.5)")
        return f"mix({a}, {b}, 0.25)"

    def cond(self):
        op = self.rng.choice(["<", ">", "<=", ">="])
        return f"({self.expr(1)} {op} {self.expr(1)})"

    def stmts(self, depth, n=None):
        r = self.rng
        out = []
        for _ in range(int(n if n is not None else r.integers(2, 5))):
            k = int(r.integers(0, 7 if depth < 2 else 4))
            if k == 0:   # declaration
                v = self.fresh()
                out.append(f"float {v} = {self.expr()};")
                self.floats.append(v)
            elif k == 1:  # assignment / compound
                if self.floats:
                    v = str(r.choice(self.floats))
                    op = r.choice(["=", "+=", "-=", "*="])
                    e = self.expr() if op != "*=" else "0.5"
                    out.append(f"{v} {op} {e};")
            elif k == 2:  # clamp to keep magnitudes bounded
                if self.floats:
                    v = str(r.choice(self.floats))
                    out.append(f"{v} = clamp({v}, -4.0, 4.0);")
            elif k == 3 and depth < 2:  # if / else
                # block-scoped: declarations inside must not leak out
                snap = list(self.floats)
                body = self.stmts(depth + 1)
                self.floats = list(snap)
                other = self.stmts(depth + 1) if r.random() < 0.5 else []
                self.floats = list(snap)
                out.append(f"if {self.cond()} {{ "
                           + " ".join(body) + " }"
                           + (" else { " + " ".join(other) + " }"
                              if other else ""))
            elif k == 4 and depth < 2:  # bounded while
                c = self.fresh()
                acc = str(r.choice(self.floats))
                lim = r.integers(2, 7)
                inner = [f"{acc} += {self.expr(2)} * 0.1;",
                         f"{acc} = clamp({acc}, -4.0, 4.0);"]
                if r.random() < 0.4:
                    inner.append(f"if ({acc} > 2.0) break;")
                if r.random() < 0.3:
                    inner.insert(0,
                                 f"if ({c} == 1.0) {{ {c} += 1.0; "
                                 "continue; }")
                out.append(
                    f"float {c} = 0.0; while ({c} < {lim}.0) {{ "
                    + " ".join(inner) + f" {c} += 1.0; }}")
            elif k == 5 and depth < 2:  # switch with fallthrough
                acc = str(r.choice(self.floats))
                sel = f"int(mod(abs({self.expr(2)}) * 3.0, 3.0))"
                out.append(
                    f"switch ({sel}) {{ "
                    f"case 0: {acc} += 0.125; break; "
                    f"case 1: {acc} -= 0.25; "
                    f"default: {acc} *= 0.5; }}")
            else:        # array round-trip
                arr = self.fresh()
                idx = f"int(mod(abs({self.expr(2)}) * 4.0, 3.0))"
                out.append(
                    f"float {arr}[3]; {arr}[0] = {self.expr()}; "
                    f"{arr}[1] = 0.25; {arr}[2] = {self.expr()}; "
                    f"{arr}[{idx}] += 0.5;")
                v = self.fresh()
                out.append(f"float {v} = {arr}[{idx}];")
                self.floats.append(v)
        return out

    def program(self):
        r = self.rng
        helper = ""
        call = ""
        if r.random() < 0.5:
            helper = ("float helper(float a, inout float b) {\n"
                      "    if (a > 0.5) { b *= 0.5; return a - 0.5; }\n"
                      "    b += 0.125;\n"
                      "    return a * 0.5;\n"
                      "}\n")
            call = "v = helper(v, py); v = clamp(v, -4.0, 4.0);\n    "
        use_struct = r.random() < 0.4
        sdecl = ("struct S { vec2 p; float w; };\n" if use_struct else "")
        sbody = ("S s = S(vec2(px, py), v); s.w += 0.25; "
                 "s.p.x = clamp(s.p.x, 0.0, 4.0); "
                 "v = s.p.x * 0.5 + s.w * 0.25;\n    " if use_struct else "")
        if use_struct and r.random() < 0.6:
            # aggregate equality + struct ternary: the else-branch
            # differs by a large constant so `==` is exact in both f32
            # (executor) and f64 (oracle) — never a rounding tie
            sbody += ("S s2 = (px < 0.5) ? s "
                      ": S(vec2(s.p.x + 8.0, s.p.y), s.w); "
                      "v += (s2 == s) ? 0.125 : -0.125; "
                      "if (s2 != s) { v += 0.0625; }\n    ")
        body = "\n    ".join(self.stmts(0, n=5))
        outs = [f"clamp({self.expr(1)} * 0.25 + 0.5, 0.0, 1.0)"
                for _ in range(3)]
        return (HEADER + sdecl + helper + f"""
void main() {{
    float px = gl_FragCoord.x / screen.x;
    float py = gl_FragCoord.y / screen.y;
    float v = smooth_audio(audio_l, audio_sz, px);
    {call}{sbody}{body}
    fragment = vec4({outs[0]}, {outs[1]}, {outs[2]}, 1.0);
}}
""")


@pytest.mark.parametrize("seed", range(20))
def test_random_program_matches_scalar_oracle(tmp_path, seed):
    rng = np.random.default_rng(4000 + seed)
    frag = Gen(rng).program()
    mod = tmp_path / "fz"
    mod.mkdir()
    (mod / "1.frag").write_text(frag)
    (tmp_path / "rc.glsl").write_text(
        "#request mod fz\n#request setgeometry 0 0 24 16\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n"
    )
    lc = loader.load(user_dir=tmp_path)
    r = Renderer(lc)
    arng = np.random.default_rng(5)
    snap = jnp.asarray(
        arng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3)
    g = jnp.float32(lc.cfg.gravity_step / lc.cfg.nominal_ups)
    chains = r.pipeline.advance(r.init_state().chains, snap[0], snap[1],
                                gravity_g=g)
    textures = r.pipeline.textures_from(chains, snap[0], snap[1])
    fn = r.module.passes[0]
    from glava_tpu.render.base import as_planes, clip_planes, interleave
    planes = clip_planes(as_planes(
        fn(PassInputs(None, textures, jnp.float32(0.1)))))
    frame = np.asarray(interleave(planes, 16, 24))
    tex_np = {k: np.asarray(v) for k, v in textures.items()}
    sz = tex_np[next(iter(tex_np))].shape[-1]
    for x in range(0, 24, 5):
        for y in range(0, 16, 5):
            ex = ScalarExec(fn.program, x=x, y=y, textures=tex_np,
                            prev=None, screen=(24, 16), sz=sz,
                            defines=fn.defines, uniforms=fn.uniforms)
            got = np.clip(np.asarray(ex.run_main(), np.float64), 0.0, 1.0)
            want = frame[y, x].astype(np.float64)
            assert np.allclose(got, want, atol=1e-3), (
                f"seed {seed} pixel ({x},{y}): oracle {got} vs "
                f"vectorized {want}\n{frag}")
