"""Drop-in GLSL shader modules, interpreted.

The reference's user-extension workflow (render.c:1488-1597): a config
root directory ``<name>/`` holding ``1.frag, 2.frag, ...`` becomes
module ``<name>``. Here each pass runs through the restricted-GLSL
interpreter (config/glsl_shader.py) as a vectorized jnp program.
Discovered and registered by the config loader; built-in Python
modules are shadowed when the user ships a same-named shader dir, just
like the reference's user-over-system path search.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from glava_tpu.config import glsl_expr, preprocessor
from glava_tpu.config.glsl_shader import (
    ParsedShader,
    ShaderError,
    _Exec,
    make_builtins,
    parse_declarations,
    parse_shader,
)
from glava_tpu.render import base
from glava_tpu.render.modules import _REGISTRY

TWOPI = 6.28318530718
PI = 3.14159265359

_SCALAR_SOURCES = {"screen", "audio_sz", "time", "prev"}


def _pass_files(mod_dir: Path) -> list[Path]:
    files = []
    n = 1
    while (mod_dir / f"{n}.frag").is_file():
        files.append(mod_dir / f"{n}.frag")
        n += 1
    return files


def scan_shader_modules(user_dir) -> dict[str, Path]:
    """Find ``<user_dir>/<name>/1.frag`` module directories."""
    out: dict[str, Path] = {}
    if user_dir is None:
        return out
    root = Path(user_dir)
    if not root.is_dir():
        return out
    for d in sorted(root.iterdir()):
        if d.is_dir() and d.name not in ("modules", "profiles", "util") \
                and (d / "1.frag").is_file():
            out[d.name] = d
    return out


def _collect_uniforms(files: list[Path]):
    """Uniform/transform declarations across all passes -> UniformSpec
    tuples for the audio pipeline + per-pass uniform name maps."""
    audio_uniforms: dict[str, tuple[str, tuple[str, ...]]] = {}
    per_pass: list[ParsedShader] = []
    for f in files:
        parsed = parse_declarations(f.read_text())
        per_pass.append(parsed)
        for src, name in parsed.uniforms:
            if src in ("audio_l", "audio_r"):
                chain = tuple(parsed.transforms.get(name, ()))
                prev_entry = audio_uniforms.get(name)
                if prev_entry is None or (not prev_entry[1] and chain):
                    audio_uniforms[name] = (src, chain)
            elif src not in _SCALAR_SOURCES:
                raise ShaderError(f"unknown uniform source '{src}'")
    # a declared uniform without `#request transform` lines receives
    # the raw (untransformed) ring, exactly like the reference
    specs = tuple(
        (name, src, chain) for name, (src, chain) in audio_uniforms.items()
    )
    return specs, per_pass


def register_shader_module(name: str, mod_dir: Path,
                           user_dir, system_dir) -> None:
    files = _pass_files(mod_dir)
    if not files:
        raise ShaderError(f"module dir '{mod_dir}' has no 1.frag")
    uniforms, _ = _collect_uniforms(files)

    def builder(ctx: base.ModuleContext) -> base.ModuleBuild:
        return _build(name, files, ctx, user_dir, system_dir)

    _REGISTRY[name] = (builder, uniforms)


def _build(name: str, files: list[Path], ctx: base.ModuleContext,
           user_dir, system_dir) -> base.ModuleBuild:
    import jax.numpy as jnp

    w, h = ctx.screen
    sz = ctx.sz
    passes = []

    # dynamic per-pixel smooth_audio fetch (see circle._per_pixel_sampler)
    from glava_tpu.render.modules.circle import _per_pixel_sampler

    fetch = _per_pixel_sampler(ctx)

    for f in files:
        raw = f.read_text()
        parsed = parse_declarations(raw)
        # collect uniform declarations made during preprocessing too —
        # included files may bind uniforms (e.g. util/premultiply.frag
        # binds `prev`); other requests are frozen at this point
        reqs: list[tuple[str, list[str]]] = []
        pctx = preprocessor.Context(
            system_dir=Path(system_dir) if system_dir else None,
            user_dir=Path(user_dir) if user_dir else None,
            on_request=lambda n, a, _f, _l: reqs.append((n, list(a))),
            defines=dict(ctx.env.defines),
        )
        # builtin macro environment (_CHANNELS etc.) for #if evaluation
        for k, v in ctx.env.variables.items():
            if isinstance(v, (int, float)) and k not in pctx.defines:
                pctx.defines[k] = repr(v)
        srcmap: list = []
        try:
            text = preprocessor.preprocess_shader_source(
                raw, pctx, fname=str(f), current_dir=f.parent,
                srcmap=srcmap,
            )
        except preprocessor.StageDisabledDirective:
            continue
        program = parse_shader(text, fname=str(f), srcmap=srcmap)
        seen = set()
        uniforms = []
        for n, a in reqs:
            if n == "uniform" and len(a) >= 2 and a[1] not in seen:
                uniforms.append((a[0], a[1]))
                seen.add(a[1])
        for src, uname in parsed.uniforms:
            if uname not in seen:
                uniforms.append((src, uname))
                seen.add(uname)
        parsed.uniforms = uniforms

        xs, ys = base.frag_coords(w, h, parsed.pixel_center_integer)
        # numpy (NOT jnp): inside a jit trace every jnp op returns a
        # tracer even on closed-over constants, which would defeat the
        # constant-shift texelFetch(prev) fast path and constant-fold
        # opportunities. Plain operators keep numpy arrays numpy; they
        # become traced only when meeting actual traced data.
        x2d = xs.astype(np.float32)[None, :]
        y2d = ys.astype(np.float32)[:, None]
        defines = dict(pctx.defines)

        def make_pass(program=program, parsed=parsed, defines=defines,
                      x2d=x2d, y2d=y2d):
            def pass_fn(inputs: base.PassInputs):
                textures = {}
                variables = dict(ctx.env.variables)
                for src, uname in parsed.uniforms:
                    if src in ("audio_l", "audio_r"):
                        textures[uname] = inputs.textures[uname]
                        variables[uname] = inputs.textures[uname]
                    elif src == "screen":
                        variables[uname] = (float(w), float(h))
                    elif src == "audio_sz":
                        variables[uname] = float(sz)
                    elif src == "time":
                        variables[uname] = inputs.time
                    elif src == "prev":
                        variables[uname] = "prev"
                variables.update({
                    "gl_FragCoord": (x2d, y2d, 0.0, 1.0),
                    "PI": PI, "TWOPI": TWOPI,
                    "fragment": (0.0, 0.0, 0.0, 0.0),
                })
                builtins = make_builtins(inputs.prev, sz, h, w, fetch)
                env = glsl_expr.Env(
                    defines=defines,
                    variables=variables,
                    pipe_values=ctx.env.pipe_values,
                    functions=builtins,
                )
                ex = _Exec(env, h, w)
                ex.src_info = (program.fname, program.srcmap)
                try:
                    # GLSL arithmetic never warns (inf/nan propagate,
                    # GPU-style); the numpy-preserving evaluator paths
                    # would otherwise emit RuntimeWarnings for e.g. the
                    # polar center pixel's divide-by-zero
                    with np.errstate(all="ignore"):
                        ex.bind_structs(program.structs)
                        ex.bind_functions(program.funcs)
                        ex.run(program.pre_body)
                        ex.run(program.body)
                    frag = env.variables.get("fragment",
                                             (0.0, 0.0, 0.0, 0.0))
                finally:
                    # don't pin this pass's tracers/provenance beyond
                    # its trace via the module-level current-exec hook
                    import glava_tpu.config.glsl_shader as _gs

                    if _gs._CURRENT_EXEC is ex:
                        _gs._CURRENT_EXEC = None
                # channel planes out — numpy (concrete) channels stay
                # numpy across the pass boundary, so downstream passes
                # see constant planes concretely
                return base.as_planes(
                    frag if isinstance(frag, tuple) else (frag,) * 4
                )

            # expose the parsed AST + knob defines + effective uniform
            # list for differential oracles (tests/scalar_oracle.py)
            pass_fn.program = program
            pass_fn.defines = defines
            pass_fn.uniforms = parsed.uniforms
            return pass_fn

        passes.append(make_pass())

    if not passes:
        raise ShaderError(f"module '{name}': every pass disabled")
    return base.ModuleBuild(name, passes)


