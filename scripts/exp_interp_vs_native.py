"""One-process interpreted-vs-native fps ratio per module @1080p.

The VERDICT r4 acceptance metric for the interpreter perf work is
"interpreted radial >= ~70% of native fps in a one-process A/B" —
separate-process comparisons draw independent fusion lotteries and
cannot measure a ratio. This interleaves builds round-robin
(native, interpreted, native, ...) in one compile session.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
        scripts/exp_interp_vs_native.py [modules...] [--rounds=N]
"""

import sys
import os

sys.path.insert(0, "/root/repo")

os.environ.setdefault("GLAVA_TPU_SLOPE_DELTA_MS", "250")  # jitter-proof slopes

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import scripts.bench_interpreted as bi  # noqa: E402

from glava_tpu.config import loader  # noqa: E402
from glava_tpu.renderer import Renderer  # noqa: E402
from glava_tpu.utils.timing import probed_slope  # noqa: E402


def native_fps(module: str) -> float:
    lc = loader.load(
        cli_requests=("setgeometry 0 0 1920 1080", "setprintframes false"),
        force_module=module)
    r = Renderer(lc)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32) * 0.3)
    g = jnp.float32(lc.cfg.gravity_step / lc.cfg.nominal_ups)

    def frames(state, snap, g):
        def body(carry, k):
            s, acc = carry
            a = snap * (1.0 + 1e-3 * k)
            s, fr = r.step(s, a, True, jnp.float32(0.1), jnp.float32(1.0),
                           g, {})
            return (s, acc + fr.sum()), None

        (s2, acc), _ = jax.lax.scan(body, (state, jnp.float32(0.0)),
                                    jnp.arange(16, dtype=jnp.float32))
        return s2, acc

    fm = jax.jit(frames, donate_argnums=(0,))
    st = r.init_state()
    st, probe = fm(st, snap, g)
    float(probe)

    def once():
        nonlocal st
        st, probe = fm(st, snap, g)
        return probe

    return 16.0 / probed_slope(once, 3, 9)


def main():
    mods = [a for a in sys.argv[1:] if not a.startswith("--")] or ["radial"]
    rounds = 3
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=", 1)[1])
    res: dict = {}
    for rd in range(rounds):
        for m in mods:
            nf = native_fps(m)
            res.setdefault((m, "native"), []).append(round(nf, 1))
            print(f"r{rd} {m:8s} native: {nf:8.1f} fps", flush=True)
            inf = bi.bench_module(m, builds=1)
            res.setdefault((m, "interp"), []).append(round(inf, 1))
            print(f"r{rd} {m:8s} interp: {inf:8.1f} fps "
                  f"(ratio {inf / nf:.2f})", flush=True)
    for m in mods:
        nat = res[(m, "native")]
        itp = res[(m, "interp")]
        import statistics

        print(f"{m}: native median {statistics.median(nat):.0f} "
              f"(min {min(nat):.0f}) / interp median "
              f"{statistics.median(itp):.0f} (min {min(itp):.0f}) "
              f"-> median ratio "
              f"{statistics.median(itp) / statistics.median(nat):.2f}")
    print(res)


if __name__ == "__main__":
    main()
