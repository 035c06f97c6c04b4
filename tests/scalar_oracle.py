"""Independent per-pixel SCALAR interpreter for the restricted-GLSL
subset — a differential oracle for the vectorized executor.

The production interpreter (config/glsl_shader._Exec) vectorizes
per-pixel control flow into masked (H, W) plane operations; this
oracle executes the SAME parsed AST at one pixel with REAL Python
control flow (actual if/while/for/switch/break/continue/return, no
masks). Agreement between the two is evidence the masking semantics
are faithful — the role a real GL driver plays for the reference.

Scalars are Python floats (f64), so comparisons against the f32
vectorized path use a small tolerance rather than bit equality.

Deliberately unsupported: derivatives (dFdx/dFdy/fwidth need quad
neighbors, meaningless at one pixel).
"""

from __future__ import annotations

import numpy as np

from glava_tpu.config import glsl_expr
from glava_tpu.config.glsl_shader import (
    Assign,
    AssignPath,
    Break,
    Continue,
    Decl,
    ExprStmt,
    ForLoop,
    FuncDef,
    If,
    ParsedShader,
    Return,
    ShaderError,
    Switch,
    WhileLoop,
    _bin,
    _lvalue_path,
)


class _BreakEx(Exception):
    pass


class _ContinueEx(Exception):
    pass


class _ReturnEx(Exception):
    def __init__(self, value=None):
        self.value = value


class ScalarExec:
    """Execute a ParsedShader at one pixel with real control flow."""

    def __init__(self, program: ParsedShader, *, x: int, y: int,
                 textures: dict, prev: np.ndarray | None,
                 screen: tuple[int, int], sz: int, time: float = 0.1,
                 defines: dict | None = None, uniforms=None,
                 fuel_cap: int = 1 << 16):
        w, h = screen
        self.program = program
        self.prev = prev
        self.sz = sz
        self.fuel_cap = fuel_cap
        self.frames: list[dict] = []
        px, py = (float(x), float(y)) if program.pixel_center_integer \
            else (x + 0.5, y + 0.5)
        variables = {
            "gl_FragCoord": (px, py, 0.0, 1.0),
            "PI": 3.14159265359,
            "TWOPI": 6.28318530718,
            "fragment": (0.0, 0.0, 0.0, 0.0),
        }
        for src, uname in (uniforms if uniforms is not None
                           else program.uniforms):
            if src in ("audio_l", "audio_r"):
                variables[uname] = np.asarray(textures[uname])
            elif src == "screen":
                variables[uname] = (float(w), float(h))
            elif src == "audio_sz":
                variables[uname] = float(sz)
            elif src == "time":
                variables[uname] = float(time)
            elif src == "prev":
                variables[uname] = "prev"
        self.env = glsl_expr.Env(defines=dict(defines or {}),
                                 variables=variables,
                                 functions=self._builtins())
        for sname, fields in program.structs.items():
            fnames = tuple(fn for _, fn in fields)
            self.env.functions[sname] = (
                lambda *a, s=sname, f=fnames:
                glsl_expr.GlslStruct(s, f, a))
        self._structs = dict(program.structs)
        for fname, fdef in program.funcs.items():
            self._bind_function(fname, fdef)

    # -- builtins (scalar mirrors of make_builtins) ---------------------

    def _fetch_audio(self, tex, i):
        i = int(np.clip(int(i), 0, self.sz - 1))
        return float(np.asarray(tex).reshape(-1)[i])

    def _builtins(self):
        sz = self.sz

        def smooth_audio(tex, _sz, idx):
            pos = min(max(float(idx), 0.0), 1.0)
            i = int(np.round(np.float32(pos) * np.float32(sz)))
            return self._fetch_audio(tex, i)

        def smooth_audio_adj(tex, _sz, idx, pixel):
            a = smooth_audio(tex, _sz, max(idx - pixel, 0.0))
            b = smooth_audio(tex, _sz, idx)
            c = smooth_audio(tex, _sz, min(idx + pixel, 1.0))
            return (a + b + c) / 3.0

        def texture(tex, x):
            if isinstance(tex, str) and tex == "prev":
                # NEAREST + GL_REPEAT on the prev FBO texture
                if self.prev is None:
                    raise ShaderError("`prev` sampled in the first pass")
                h, w = self.prev.shape[:2]

                def nidx(c, n):
                    u = float(c) - np.floor(float(c))
                    return int(min(np.floor(u * np.float32(n)), n - 1))

                return tuple(float(c) for c in
                             self.prev[nidx(x[1], h), nidx(x[0], w)])
            u = float(x) - np.floor(float(x))
            i = int(min(np.floor(u * np.float32(sz)), sz - 1))
            v = self._fetch_audio(tex, i)
            return (v, 0.0, 0.0, 1.0)

        def textureSize(tex, _lod=0):
            if isinstance(tex, str) and tex == "prev":
                h, w = self.prev.shape[:2] if self.prev is not None                     else (0, 0)
                return (float(w), float(h))
            return float(sz)

        def ivec2(x, y):
            # GL int cast truncates toward zero
            return (float(int(float(x))), float(int(float(y))))

        def texelFetch(tex, idx, _lod=0):
            if isinstance(tex, str) and tex == "prev":
                if self.prev is None:
                    raise ShaderError("`prev` sampled in the first pass")
                xi, yi = int(idx[0]), int(idx[1])
                h, w = self.prev.shape[:2]
                if not (0 <= xi < w and 0 <= yi < h):
                    return (0.0, 0.0, 0.0, 0.0)
                return tuple(float(c) for c in self.prev[yi, xi])
            i = int(float(idx)) if not isinstance(idx, tuple) \
                else int(float(idx[0]))
            v = self._fetch_audio(tex, i)
            return (v, 0.0, 0.0, 1.0)

        return {
            "texture": texture,
            "texelFetch": texelFetch,
            "textureLod": lambda tex, x, _lod=0: texture(tex, x),
            "textureSize": textureSize,
            "ivec2": ivec2,
            "smooth_audio": smooth_audio,
            "smooth_audio_adj": smooth_audio_adj,
        }

    # -- user functions --------------------------------------------------

    def _bind_function(self, fname: str, fdef: FuncDef):
        outs = tuple(i for i, q in enumerate(fdef.quals or ())
                     if q in ("out", "inout"))

        def call(*args, _lvalues=None, f=fdef, o=outs):
            sink: dict = {}
            ret = self._call(f, args, sink, tuple(f.params[i] for i in o))
            for i in o:
                toks = (_lvalues or {}).get(i)
                path = _lvalue_path(toks) if toks is not None else None
                if path is None:
                    raise ShaderError(
                        f"out argument of '{f.name}' must be a variable")
                name, items = path
                val = sink.get(f.params[i])
                if items:
                    chain, _ = self._resolve(name, items)
                    val = self._rebuild(chain, val)
                self.env.variables[name] = val
            return ret

        if outs:
            call._needs_lvalues = outs
        self.env.functions[fname] = call

    def _call(self, fdef: FuncDef, args, sink, capture):
        frame: dict = {}
        self.frames.append(frame)
        env = self.env
        try:
            for p, a in zip(fdef.params, args):
                if p not in frame:
                    frame[p] = (p in env.variables, env.variables.get(p))
                env.variables[p] = a
            value = None
            try:
                self.run(fdef.body)
            except _ReturnEx as r:
                value = r.value
            for p in capture:
                sink[p] = env.variables.get(p)
            return value
        finally:
            self.frames.pop()
            for name, (had, old) in frame.items():
                if had:
                    env.variables[name] = old
                else:
                    env.variables.pop(name, None)

    # -- lvalues ---------------------------------------------------------

    def _resolve(self, target, items):
        root = self.env.variables.get(target)
        if root is None:
            raise ShaderError(f"'{target}' used before assignment")
        chain = []
        cur = root
        for kind, it in items:
            if kind == "m":
                cur_child = (cur.get(it)
                             if isinstance(cur, glsl_expr.GlslStruct)
                             else self._swz(cur, it))
            else:
                it = self._eval(it)
                cur_child = glsl_expr.index_value(cur, it)
            chain.append((cur, kind, it))
            cur = cur_child
        return chain, cur

    @staticmethod
    def _swz(val, swizzle):
        idxs = [glsl_expr._SWIZZLE[c] for c in swizzle]
        if len(idxs) == 1:
            return val[idxs[0]]
        return tuple(val[i] for i in idxs)

    @staticmethod
    def _rebuild(chain, rhs):
        for parent, kind, key in reversed(chain):
            if kind == "m":
                if isinstance(parent, glsl_expr.GlslStruct):
                    rhs = parent.replace(key, rhs)
                else:
                    idxs = [glsl_expr._SWIZZLE[c] for c in key]
                    comps = list(parent)
                    rt = rhs if isinstance(rhs, tuple) else (rhs,) * len(idxs)
                    for i, r in zip(idxs, rt):
                        comps[i] = r
                    rhs = tuple(comps)
            else:
                rhs = glsl_expr.index_store(parent, key, rhs)
        return rhs

    # -- execution -------------------------------------------------------

    def _eval(self, toks):
        return glsl_expr._Parser(list(toks), self.env).parse()

    def run(self, body):
        for stmt in body:
            self._stmt(stmt)

    def run_main(self):
        try:
            self.run(self.program.pre_body)
            self.run(self.program.body)
        except _ReturnEx:
            pass
        frag = self.env.variables.get("fragment", (0.0, 0.0, 0.0, 0.0))
        if not isinstance(frag, tuple):
            frag = (frag,) * 4
        return tuple(float(c) for c in frag)

    def _zero_struct(self, tname):
        fields = self._structs[tname]
        vals = []
        for ftype, _ in fields:
            if ftype in self._structs:
                vals.append(self._zero_struct(ftype))
            elif ftype in ("vec2", "vec3", "vec4"):
                vals.append((0.0,) * int(ftype[-1]))
            elif ftype == "bool":
                vals.append(False)
            else:
                vals.append(0.0)
        return glsl_expr.GlslStruct(
            tname, tuple(fn for _, fn in fields), vals)

    def _stmt(self, stmt):
        env = self.env
        if isinstance(stmt, Decl):
            for name, init, arrsize in stmt.names:
                if arrsize is not None:
                    val = self._decl_array(name, init, arrsize, stmt.dtype)
                elif init is not None:
                    val = self._eval(init)
                elif stmt.dtype in self._structs:
                    val = self._zero_struct(stmt.dtype)
                else:
                    val = 0.0
                if self.frames:
                    frame = self.frames[-1]
                    if name not in frame:
                        frame[name] = (name in env.variables,
                                       env.variables.get(name))
                env.variables[name] = val
        elif isinstance(stmt, Assign):
            toks = [t for t in stmt.expr if t[0] != "end"]
            if (stmt.op == "=" and not stmt.swizzle and stmt.index is None
                    and len(toks) >= 3 and toks[0][0] == "ident"
                    and toks[1] == ("op", "=")):
                self._stmt(Assign(toks[0][1], None, "=",
                                  toks[2:] + [("end", "")]))
                env.variables[stmt.target] = env.variables.get(toks[0][1])
                return
            rhs = self._eval(stmt.expr)
            cur = env.variables.get(stmt.target)
            idx = self._eval(stmt.index) if stmt.index is not None else None
            elem = glsl_expr.index_value(cur, idx) if idx is not None else cur
            if stmt.op != "=":
                base = elem
                if stmt.swizzle:
                    base = (elem.get(stmt.swizzle)
                            if isinstance(elem, glsl_expr.GlslStruct)
                            else self._swz(elem, stmt.swizzle))
                rhs = _bin(base, rhs, stmt.op[:-1])
            if stmt.swizzle:
                if isinstance(elem, glsl_expr.GlslStruct):
                    rhs = elem.replace(stmt.swizzle, rhs)
                else:
                    idxs = [glsl_expr._SWIZZLE[c] for c in stmt.swizzle]
                    comps = list(elem)
                    rt = rhs if isinstance(rhs, tuple) else (rhs,) * len(idxs)
                    for i, r in zip(idxs, rt):
                        comps[i] = r
                    rhs = tuple(comps)
            if idx is not None:
                rhs = glsl_expr.index_store(cur, idx, rhs)
            env.variables[stmt.target] = rhs
        elif isinstance(stmt, AssignPath):
            chain, leaf = self._resolve(stmt.target, stmt.items)
            rhs = self._eval(stmt.expr)
            if stmt.op != "=":
                rhs = _bin(leaf, rhs, stmt.op[:-1])
            env.variables[stmt.target] = self._rebuild(chain, rhs)
        elif isinstance(stmt, If):
            if self._truth(self._eval(stmt.cond)):
                self.run(stmt.then)
            else:
                self.run(stmt.other)
        elif isinstance(stmt, Return):
            raise _ReturnEx(self._eval(stmt.expr)
                            if stmt.expr is not None else None)
        elif isinstance(stmt, ExprStmt):
            self._eval(stmt.expr)
        elif isinstance(stmt, ForLoop):
            var = stmt.var
            had, old = var in env.variables, env.variables.get(var)
            env.variables[var] = self._eval(stmt.start)
            cmp = {"<": lambda a, b: a < b, "<=": lambda a, b: a <= b,
                   ">": lambda a, b: a > b, ">=": lambda a, b: a >= b}[
                       stmt.cond_op]
            fuel = 0
            while cmp(float(env.variables[var]),
                      float(self._eval(stmt.bound))):
                if fuel >= self.fuel_cap:
                    break
                fuel += 1
                try:
                    self.run(stmt.body)
                except _ContinueEx:
                    pass
                except _BreakEx:
                    break
                step = (self._eval(stmt.step)
                        if stmt.step is not None else 1.0)
                env.variables[var] = (float(env.variables[var])
                                      + stmt.step_sign * float(step))
            if had:
                env.variables[var] = old
            # (vectorized keeps the counter in scope too; harmless)
        elif isinstance(stmt, WhileLoop):
            fuel = 0
            while self._truth(self._eval(stmt.cond)):
                if fuel >= self.fuel_cap:
                    break
                fuel += 1
                try:
                    try:
                        self.run(stmt.body)
                    except _ContinueEx:
                        pass
                    self.run(stmt.epilogue)
                except _BreakEx:
                    break
        elif isinstance(stmt, Switch):
            sel = int(float(self._eval(stmt.expr)))
            start = None
            default = None
            for gi, (labels, _body) in enumerate(stmt.cases):
                if labels is None:
                    default = gi
                    continue
                if any(int(float(self._eval(lab))) == sel
                       for lab in labels):
                    start = gi
                    break
            if start is None:
                start = default
            if start is not None:
                try:
                    for _, body in stmt.cases[start:]:
                        self.run(body)
                except _BreakEx:
                    pass
        elif isinstance(stmt, Break):
            raise _BreakEx()
        elif isinstance(stmt, Continue):
            raise _ContinueEx()
        else:  # pragma: no cover
            raise ShaderError(f"scalar oracle: unsupported {stmt!r}")

    def _decl_array(self, name, init, arrsize, dtype):
        size_toks = [t for t in arrsize if t[0] != "end"]
        n = int(self._eval(arrsize)) if size_toks else None
        if init is None:
            if dtype in self._structs:
                return glsl_expr.GlslArray(
                    [self._zero_struct(dtype) for _ in range(n)])
            return glsl_expr.GlslArray([0.0] * n)
        return self._eval(init)

    @staticmethod
    def _truth(v):
        if isinstance(v, (np.ndarray, np.generic)):
            return bool(v)
        return bool(v)
