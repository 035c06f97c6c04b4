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
        self.ints: list[str] = []
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

    def iexpr(self):
        """A small bounded int expression (exact in f32 and f64)."""
        r = self.rng
        if self.ints and r.random() < 0.5:
            return str(r.choice(self.ints))
        return f"int(mod(abs({self.expr(2)}) * 8.0, 16.0))"

    def stmts(self, depth, n=None):
        r = self.rng
        out = []
        for _ in range(int(n if n is not None else r.integers(2, 5))):
            k = int(r.integers(0, 13 if depth < 2 else 5))
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
            elif k == 3:  # int bit/shift/mod ops (exact both sides)
                iv = self.fresh()
                ops = [f"int {iv} = {self.iexpr()};",
                       f"{iv} = ({iv} << 1) ^ ({iv} >> 2);",
                       f"{iv} &= 31;"]
                if r.random() < 0.5:
                    ops.append(f"{iv} = ({iv} | 3) % 13;")
                if r.random() < 0.4:
                    ops.append(f"{iv} = ~{iv} & 15;")
                fv = self.fresh()
                ops.append(f"float {fv} = float({iv}) * 0.0625;")
                out.append(" ".join(ops))
                self.ints.append(iv)
                self.floats.append(fv)
            elif k == 4:  # uint hash idiom (round-4 surface)
                uv = self.fresh()
                fv = self.fresh()
                out.append(
                    f"uint {uv} = uint({self.iexpr()} & 255); "
                    f"{uv} = ({uv} << 3u) ^ ({uv} >> 1u); "
                    f"{uv} &= 0x7fu; "
                    f"float {fv} = float({uv}) / 128.0;")
                self.floats.append(fv)
            elif k == 5 and depth < 2:  # if / else
                # block-scoped: declarations inside must not leak out
                snap = list(self.floats)
                sni = list(self.ints)
                body = self.stmts(depth + 1)
                self.floats, self.ints = list(snap), list(sni)
                other = self.stmts(depth + 1) if r.random() < 0.5 else []
                self.floats, self.ints = list(snap), list(sni)
                out.append(f"if {self.cond()} {{ "
                           + " ".join(body) + " }"
                           + (" else { " + " ".join(other) + " }"
                              if other else ""))
            elif k == 6 and depth < 2:  # bounded while
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
                if r.random() < 0.35:  # switch nested in while
                    inner.append(
                        f"switch (int(mod({c}, 3.0))) {{ "
                        f"case 0: {acc} += 0.0625; break; "
                        f"case 2: {acc} -= 0.03125; "
                        f"default: break; }}")
                if r.random() < 0.3:   # out-param call under the loop
                    tv = self.fresh()
                    inner.append(
                        f"float {tv}; split2({acc}, {tv}); "
                        f"{acc} = clamp({acc} + {tv} * 0.125, -4.0, 4.0);")
                    self.uses_split2 = True
                out.append(
                    f"float {c} = 0.0; while ({c} < {lim}.0) {{ "
                    + " ".join(inner) + f" {c} += 1.0; }}")
            elif k == 7 and depth < 2:  # for loop (incl. decrementing)
                c = self.fresh()
                acc = str(r.choice(self.floats))
                lim = int(r.integers(2, 6))
                if r.random() < 0.5:
                    hdr = f"for (int {c} = 0; {c} < {lim}; {c}++)"
                else:
                    hdr = f"for (int {c} = {lim}; {c} > 0; {c}--)"
                out.append(
                    f"{hdr} {{ {acc} = clamp({acc} + float({c}) * "
                    "0.0625, -4.0, 4.0); }")
            elif k == 8 and depth < 2:  # switch with fallthrough
                acc = str(r.choice(self.floats))
                sel = f"int(mod(abs({self.expr(2)}) * 3.0, 3.0))"
                out.append(
                    f"switch ({sel}) {{ "
                    f"case 0: {acc} += 0.125; break; "
                    f"case 1: {acc} -= 0.25; "
                    f"default: {acc} *= 0.5; }}")
            elif k == 9 and depth < 2:  # structs in an array
                arr = self.fresh()
                idx = f"int(mod(abs({self.expr(2)}) * 4.0, 2.0))"
                fv = self.fresh()
                out.append(
                    f"S {arr}[2]; "
                    f"{arr}[0] = S(vec2(px, 0.25), {self.expr(1)}); "
                    f"{arr}[1] = S(vec2(0.5, py), 0.75); "
                    f"{arr}[{idx}].w += 0.125; "
                    f"float {fv} = clamp({arr}[{idx}].w + "
                    f"{arr}[0].p.x * 0.25, -4.0, 4.0);")
                self.floats.append(fv)
                self.uses_struct = True
            elif k == 10:  # vec swizzle-assign + vector ternary
                vv = self.fresh()
                fv = self.fresh()
                out.append(
                    f"vec2 {vv} = vec2({self.expr(1)}, {self.expr(1)}); "
                    f"{vv}.yx = {vv}.xy * 0.5; "
                    f"{vv} = {self.cond()} ? {vv} : vec2(0.25, -0.5); "
                    f"float {fv} = clamp({vv}.x + {vv}.y, -4.0, 4.0);")
                self.floats.append(fv)
            elif k == 11:  # mat2 algebra
                mv = self.fresh()
                fv = self.fresh()
                out.append(
                    f"mat2 {mv} = mat2(1.0, 0.25, -0.5, 1.0); "
                    f"{mv} = {mv} * mat2(clamp({self.expr(1)}, -2.0, 2.0)); "
                    f"vec2 {mv}r = {mv} * vec2(0.5, 0.25); "
                    f"float {fv} = clamp({mv}r.x + transpose({mv})[1][0],"
                    " -4.0, 4.0);")
                self.floats.append(fv)
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
        self.uses_struct = False
        self.uses_split2 = False
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
        body = "\n    ".join(self.stmts(0, n=6))
        outs = [f"clamp({self.expr(1)} * 0.25 + 0.5, 0.0, 1.0)"
                for _ in range(3)]
        sdecl = ("struct S { vec2 p; float w; };\n"
                 if (use_struct or self.uses_struct) else "")
        if self.uses_split2:
            # out-param written on BOTH paths, called under loop masks
            helper += ("void split2(float a, out float o) {\n"
                       "    if (a > 1.0) { o = a * 0.25; return; }\n"
                       "    o = a + 0.125;\n"
                       "}\n")
        return (HEADER + sdecl + helper + f"""
void main() {{
    float px = gl_FragCoord.x / screen.x;
    float py = gl_FragCoord.y / screen.y;
    float v = smooth_audio(audio_l, audio_sz, px);
    {call}{sbody}{body}
    fragment = vec4({outs[0]}, {outs[1]}, {outs[2]}, 1.0);
}}
""")


def _fuzz_n(default: int = 48) -> int:
    """CI runs a fixed seeded subset; GLAVA_TPU_FUZZ_N=200+ deepens
    (the full sweep is run each round — see docs/STATUS.md)."""
    import os

    try:
        return int(os.environ.get("GLAVA_TPU_FUZZ_N", default))
    except ValueError:
        return default


@pytest.mark.parametrize("seed", range(_fuzz_n()))
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
