"""Decompose interpreted graph+ANTI_ALIAS @1080p per PASS.

Times pass-prefix chains (pipeline update + passes[:k]) under the
honest protocol and reports each pass's marginal cost — the lever map
for the slowest verbatim path. graph has 4 reference passes
(shaders/glava/graph/{1..4}.frag); with ANTI_ALIAS, 3.frag runs the
per-column boundary walk (first-hit scan + latch lowering).

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_graph_aa.py
"""

from __future__ import annotations

import glob
import shutil
import sys
import tempfile
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from glava_tpu.config import loader
from glava_tpu.render.base import (
    PassInputs, as_planes, clip_planes, interleave,
)
from glava_tpu.renderer import Renderer
from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.utils.timing import probed_slope

_enable_compile_cache()

REF = "/root/reference/shaders/glava"


def build_renderer(module="graph", knobs="#define ANTI_ALIAS 1\n",
                   screen=(1920, 1080)):
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
            "#request setprintframes false\n"
        )
        if knobs:
            (tmp / f"{module}.glsl").write_text(knobs)
        lc = loader.load(user_dir=tmp, system_dir=REF)
        return Renderer(lc)


def prefix_cost(r, k, iters=8):
    """Marginal per-frame cost of pipeline update + passes[:k]."""
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, r.cfg.bufsize)).astype(np.float32) * 0.3)
    g = jnp.float32(r.cfg.gravity_step / r.cfg.nominal_ups)
    full_passes = r.module.passes
    sub = full_passes[:k]

    def scan(state, snap, g):
        def body(carry, i):
            s, acc = carry
            a = snap * (1.0 + 1e-3 * i)
            # replicate Renderer.step with a truncated pass list
            key_start = s.key_end
            key_end = a
            feed = key_start + (key_end - key_start) * 1.0
            chains = r.pipeline.advance(
                s.chains, feed[..., 0, :], feed[..., 1, :], gravity_g=g)
            textures = r.pipeline.textures_from(
                chains, feed[..., 0, :], feed[..., 1, :])
            out = None
            inp = PassInputs(prev=None, textures=textures,
                             time=jnp.float32(0.1))
            for fn in sub:
                out = clip_planes(as_planes(
                    fn(PassInputs(out, inp.textures, inp.time))))
            red = (interleave(out, r.screen[1], r.screen[0]).sum()
                   if out is not None
                   else sum(t.sum() for t in textures.values()))
            ns = type(s)(chains, key_start, key_end)
            return (ns, acc + red), None

        (s2, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)),
            jnp.arange(iters, dtype=jnp.float32))
        return s2, acc

    j = jax.jit(scan, donate_argnums=(0,))
    st = r.init_state()
    st, probe = j(st, snap, g)
    float(probe)
    box = [st]

    def once():
        box[0], p = j(box[0], snap, g)
        return p

    return probed_slope(once, 3, 9) / iters


def main():
    print("backend:", jax.default_backend())
    r = build_renderer()
    n = len(r.module.passes)
    print(f"graph+AA passes: {n}")
    costs = []
    for k in range(n + 1):
        c = prefix_cost(r, k)
        costs.append(c)
        label = "pipeline+textures" if k == 0 else f"passes[:{k}]"
        marg = c - costs[k - 1] if k else c
        print(f"{label:20s}: {c*1e6:8.1f} us  (marginal {marg*1e6:8.1f} us)")
    print(f"full-frame fps: {1/costs[-1]:,.0f}")


if __name__ == "__main__":
    main()
