#!/usr/bin/env python
"""XLA cost-analysis roofline for interpreted vs native module steps.

Compiles ONE renderer step at 1080p on the CPU backend (proxy for the
TPU lowering — fusion decisions differ but plane traffic is close) and
prints `bytes accessed` / flops per frame.  Used to find which paths
still pay interpreter-overhead HBM traffic after the halo work.

Usage: python scripts/cost_interp.py [module ...]   (default: all five)
  module 'graph_aa' = graph with ANTI_ALIAS 1.
"""

import glob
import json
import shutil
import sys
import tempfile
from pathlib import Path

sys.path.insert(0, ".")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

REF = "/root/reference/shaders/glava"


def build(module: str, knobs: str, interpreted: bool):
    screen = (1920, 1080)
    if interpreted:
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
    else:
        reqs = ["setgeometry 0 0 1920 1080", "setbufsize 1024",
                "setsamplesize 256", "setprintframes false"]
        lc = loader.load(cli_requests=tuple(reqs), force_module=module)
    return Renderer(lc)


def cost(r: Renderer):
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, r.cfg.bufsize)).astype(np.float32) * 0.3)
    g = jnp.float32(0.05)

    def step(state, snap, g):
        s, fr = r.step(state, snap, True, jnp.float32(0.0), jnp.float32(1.0),
                       g, {})
        return s, fr.sum()

    st = r.init_state()
    c = jax.jit(step).lower(st, snap, g).compile().cost_analysis()
    if isinstance(c, list):
        c = c[0]
    return c.get("bytes accessed", float("nan")), c.get("flops",
                                                        float("nan"))


def main() -> None:
    todo = sys.argv[1:] or ["bars", "radial", "graph", "graph_aa", "wave",
                            "circle"]
    out = {}
    for m in todo:
        name, knobs = (("graph", "#define ANTI_ALIAS 1\n")
                       if m == "graph_aa" else (m, ""))
        row = {}
        for kind, interp in (("interp", True), ("native", False)):
            if m == "graph_aa" and kind == "native":
                continue
            try:
                b, f = cost(build(name, knobs, interp))
                row[kind] = {"MB": round(b / 1e6, 1),
                             "MFLOP": round(f / 1e6, 1)}
            except Exception as e:  # noqa: BLE001
                row[kind] = f"FAILED {type(e).__name__}: {e}"
            print(f"{m}/{kind}: {row[kind]}", file=sys.stderr)
        out[m] = row
    print(json.dumps(out))


if __name__ == "__main__":
    main()
