#!/usr/bin/env python
"""Rank top-level instructions of a compiled interpreted-module step by
HBM traffic on the REAL TPU backend (the CPU proxy strips
optimization barriers before fusion, so barrier-sensitive questions
must compile here). Compiles only — nothing executes.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
         scripts/cost_hlo_rank_tpu.py <module> [top_n]
  module 'graph_aa' = graph with ANTI_ALIAS 1.  Env (PREV_MAT etc.)
  applies as set in the calling shell.
"""

import glob
import re
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import jax
import numpy as np
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

REF = "/root/reference/shaders/glava"

DT_BYTES = {"f32": 4, "s32": 4, "u32": 4, "pred": 1, "u8": 1, "f64": 8,
            "s64": 8, "bf16": 2, "f16": 2, "s16": 2, "u16": 2, "s8": 1}
SHAPE_RE = re.compile(r"(f32|s32|u32|pred|u8|f64|s64|bf16|f16|s16|u16|s8)"
                      r"\[([\d,]*)\]")


def shape_bytes(s: str) -> int:
    total = 0
    for dt, dims in SHAPE_RE.findall(s):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * DT_BYTES[dt]
    return total


def build(module: str, knobs: str, native: bool = False):
    screen = (1920, 1080)
    if native:
        lc = loader.load(
            cli_requests=(f"setgeometry 0 0 {screen[0]} {screen[1]}",
                          "setprintframes false"),
            force_module=module)
        return Renderer(lc)
    with tempfile.TemporaryDirectory() as td:
        tmp = Path(td)
        mod = tmp / module
        mod.mkdir()
        for f in sorted(glob.glob(f"{REF}/{module}/*.frag")):
            shutil.copy(f, mod)
        (tmp / "rc.glsl").write_text(
            f"#request mod {module}\n"
            f"#request setgeometry 0 0 {screen[0]} {screen[1]}\n"
            "#request setbufsize 1024\n#request setsamplesize 256\n"
            "#request setprintframes false\n")
        if knobs:
            (tmp / f"{module}.glsl").write_text(knobs)
        lc = loader.load(user_dir=tmp, system_dir=REF)
        return Renderer(lc)


def main() -> None:
    args = [a for a in sys.argv[1:] if a != "--native"]
    native = "--native" in sys.argv[1:]
    module = args[0] if args else "circle"
    top_n = int(args[1]) if len(args) > 1 else 25
    name, knobs = (("graph", "#define ANTI_ALIAS 1\n")
                   if module == "graph_aa" else (module, ""))
    print("backend:", jax.default_backend(),
          "native" if native else "interpreted", flush=True)
    r = build(name, knobs, native=native)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, r.cfg.bufsize)).astype(np.float32) * 0.3)

    def step(state, snap):
        s, fr = r.step(state, snap, True, jnp.float32(0.0),
                       jnp.float32(1.0), jnp.float32(0.05), {})
        return s, fr.sum()

    st = r.init_state()
    compiled = jax.jit(step).lower(st, snap).compile()
    txt = compiled.as_text()
    # NOTE: a 0 count does NOT mean the PREV_MAT gate didn't fire —
    # barriers are present in the StableHLO (4 for interpreted circle
    # @1080p under the auto gate) but the TPU pipeline consumes them
    # after they constrain fusion; no "barrier" token survives into
    # the optimized module, while the fps effect is real and measured
    # (exp_prevmat_ab.py: wave 4,577 -> 14,366 fps).
    print("opt-barrier instrs:", txt.count("opt-barrier"), flush=True)

    # per-instruction (output + operand) bytes of the entry computation
    m = re.search(r"ENTRY [^\n]*\{(.*?)\n\}", txt, re.S)
    body = m.group(1) if m else txt
    rows = []
    named = {}
    for line in txt.splitlines():
        s = line.strip()
        mm = re.match(r"(%[\w.\-]+) = (\S+?) ([a-z\-]+)\(", s)
        if mm:
            named[mm.group(1)] = mm.group(2)
    for line in body.splitlines():
        s = line.strip()
        mm = re.match(r"(?:ROOT )?(%[\w.\-]+) = (\S+?) ([a-z\-]+)\((.*)",
                      s)
        if not mm:
            continue
        name_i, shp, op, rest = mm.groups()
        ob = shape_bytes(shp)
        ib = sum(shape_bytes(named.get(o, ""))
                 for o in re.findall(r"%[\w.\-]+", rest))
        rows.append((ob + ib, ob, ib, op, name_i))
    rows.sort(reverse=True)
    total = sum(r0 for r0, *_ in rows)
    print(f"entry total (out+in) = {total/1e6:.1f} MB over "
          f"{len(rows)} instructions")
    for tb, ob, ib, op, name_i in rows[:top_n]:
        print(f"  {tb/1e6:9.1f} MB  out={ob/1e6:7.1f} in={ib/1e6:7.1f}  "
              f"{op:28s} {name_i}")

    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    print("cost_analysis bytes accessed MB:",
          round(ca.get("bytes accessed", float("nan")) / 1e6, 1))


if __name__ == "__main__":
    main()
