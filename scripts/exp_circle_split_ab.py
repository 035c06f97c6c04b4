"""A/B the NATIVE circle static-lookup form in ONE process: stacked
(3, H*W) single kernel vs three per-site (H, W) lookups.

Motivation: the round-5 one-process interp-vs-native ratio run
(scripts/exp_interp_vs_native.py) measured INTERPRETED circle at
1.07-1.59x the native module @1080p; the TPU-HLO rank of the native
program showed the stacked lookup's reshape / pad / permutation-
constant plumbing (~220 MB of the 556 MB total) where the interpreter
issues three plain (H, W) lookups. If the split form wins, the stack
was the regression.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
        scripts/exp_circle_split_ab.py [--rounds=N] [--geometry=WxH]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("GLAVA_TPU_SLOPE_DELTA_MS", "250")  # jitter-proof slopes

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from glava_tpu.config import loader  # noqa: E402
from glava_tpu.renderer import Renderer  # noqa: E402
from glava_tpu.utils.timing import probed_slope  # noqa: E402


def native_fps(geometry: str) -> float:
    w, h = geometry.split("x")
    lc = loader.load(
        cli_requests=(f"setgeometry 0 0 {w} {h}", "setprintframes false"),
        force_module="circle")
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
    rounds = 3
    geometry = "1920x1080"
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=", 1)[1])
        if a.startswith("--geometry"):
            geometry = a.split("=", 1)[1]
    res: dict = {}
    for rd in range(rounds):
        for mode in ("0", "1"):
            os.environ["GLAVA_TPU_CIRCLE_SPLIT_LK"] = mode
            fps = native_fps(geometry)
            res.setdefault(mode, []).append(round(fps, 1))
            print(f"r{rd} split={mode}: {fps:8.1f} fps", flush=True)
    os.environ.pop("GLAVA_TPU_CIRCLE_SPLIT_LK", None)
    import statistics

    for mode in ("0", "1"):
        v = res[mode]
        print(f"split={mode}: median {statistics.median(v):.0f} "
              f"(min {min(v):.0f} best {max(v):.0f})")
    print(res)


if __name__ == "__main__":
    main()
