"""One-process A/B: the tap_source materialization barrier on the
NATIVE modules' neighbor-tap passes (GLAVA_TPU_PREV_MAT=1/0) @1080p,
interleaved twice to expose drift.

Hypothesis (from TPU-HLO ranking of the interpreted programs): XLA
duplicates the tap source's producing expression — for circle, the
draw_mask field with its three table lookups — into every
shifted-window fusion; one optimization_barrier forces a single
materialization that the six taps then slice.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_tapmat_native_ab.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("GLAVA_TPU_SLOPE_DELTA_MS", "250")  # jitter-proof slopes

import numpy as np

import jax
import jax.numpy as jnp

from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.utils.timing import probed_slope

_enable_compile_cache()

from glava_tpu.config import loader  # noqa: E402
from glava_tpu.renderer import Renderer  # noqa: E402


def measure(module: str, mat: str, screen=(1920, 1080)):
    os.environ["GLAVA_TPU_PREV_MAT"] = mat
    lcm = loader.load(cli_requests=(f"setgeometry 0 0 {screen[0]} {screen[1]}",
                                    "setprintframes false"),
                      force_module=module)
    rm = Renderer(lcm)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, lcm.cfg.bufsize)).astype(np.float32) * 0.3)
    g = jnp.float32(lcm.cfg.gravity_step / lcm.cfg.nominal_ups)

    def scan(state, snap, g):
        def body(carry, k):
            s, acc = carry
            s, fr = rm.step(s, snap * (1.0 + 1e-3 * k), True,
                            jnp.float32(0.1), jnp.float32(1.0), g, {})
            return (s, acc + fr.sum()), None

        (s2, acc), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                    jnp.arange(16, dtype=jnp.float32))
        return s2, acc

    j = jax.jit(scan, donate_argnums=(0,))
    st, p = j(rm.init_state(), snap, g)
    float(p)
    box = [st]

    def once():
        box[0], p = j(box[0], snap, g)
        return p

    return 16.0 / probed_slope(once, 3, 9, repeats=3)


def main():
    print("backend:", jax.default_backend())
    mods = sys.argv[1:] or ["circle", "graph", "wave"]
    for rnd in range(2):
        for m in mods:
            for mode in ("1", "0"):
                fps = measure(m, mode)
                print(f"round {rnd} {m:7s} @1080p  mat={mode}: {fps:8.1f} fps",
                      flush=True)
        # small-frame regime (fleet sub-batch size): materialization
        # could cost more than the duplicated recompute it saves
        for m in mods:
            for mode in ("1", "0"):
                fps = measure(m, mode, screen=(512, 256))
                print(f"round {rnd} {m:7s} @512x256 mat={mode}: {fps:8.1f} fps",
                      flush=True)
    os.environ.pop("GLAVA_TPU_PREV_MAT", None)


if __name__ == "__main__":
    main()
