"""Decompose the 64-stream heterogeneous fleet step (bench.py's
BASELINE config #4 shape): per-module 16-stream sub-batch costs at
512x256, honest protocol. The mixed step is the sum of its members
(pinned round 3), so the slowest member is the lever.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_fleet.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from glava_tpu.config import loader
from glava_tpu.parallel.batch import BatchedRenderer, example_batch
from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.utils.timing import probed_slope

_enable_compile_cache()


def member_cost(module: str, n: int = 16, K: int = 8) -> float:
    lc = loader.load(cli_requests=("setgeometry 0 0 512 256",
                                   "setprintframes false"),
                     force_module=module)
    br = BatchedRenderer(lc, n_streams=n)
    ex = example_batch(br)

    def frames(state, audio, mod, tim, im, g):
        def body(carry, k):
            s, acc = carry
            a = audio * (1.0 + 1e-3 * k)
            s, fr = br.step(s, a, mod, tim, im, g, {})
            return (s, acc + fr.sum()), None

        (state, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)),
            jnp.arange(K, dtype=jnp.float32))
        return state, acc

    f = jax.jit(frames, donate_argnums=(0,))
    st = br.init_state()
    st, p = f(st, ex["audio"], ex["modified"], ex["time"],
              ex["interp_mod"], ex["gravity_g"])
    float(p)
    holder = [st]

    def once():
        holder[0], p = f(holder[0], ex["audio"], ex["modified"],
                         ex["time"], ex["interp_mod"], ex["gravity_g"])
        return p

    return probed_slope(once, 3, 9) / K


def main():
    total = 0.0
    for m in ("bars", "radial", "wave", "circle"):
        t = member_cost(m)
        total += t
        print(f"{m:8s} x16 @512x256: {t*1e6:8.1f} us/step "
              f"({16/t:,.0f} member-fps total)")
    print(f"sum of members: {total*1e6:.1f} us -> "
          f"{1/total:.0f} fleet fps/stream equivalent")


if __name__ == "__main__":
    main()
