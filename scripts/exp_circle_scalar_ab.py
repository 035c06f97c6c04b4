"""One-process A/B: native circle fused scalar-field chain vs the
literal three-pass form @1080p (GLAVA_TPU_CIRCLE_SCALAR=1/0),
interleaved twice to expose drift.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_circle_scalar_ab.py
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


def measure(scalar: str):
    os.environ["GLAVA_TPU_CIRCLE_SCALAR"] = scalar
    lcm = loader.load(cli_requests=("setgeometry 0 0 1920 1080",
                                    "setprintframes false"),
                      force_module="circle")
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
    for rnd in range(2):
        for mode, label in (("1", "fused "), ("0", "literal")):
            fps = measure(mode)
            print(f"round {rnd} circle {label}: {fps:8.1f} fps", flush=True)
    os.environ.pop("GLAVA_TPU_CIRCLE_SCALAR", None)


if __name__ == "__main__":
    main()
