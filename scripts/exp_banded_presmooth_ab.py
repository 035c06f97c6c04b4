"""One-process dense-vs-banded presmooth A/B on native modules @1080p.

The default smooth pass multiplies every update by a dense
(scaled_bufsize x band) resample matrix — a 21 MB HLO constant read
per frame at bufsize 4096 (TPU-HLO rank: the single largest item in
every native module's program, `%convolution_clamp_fusion`). The
per-row windows are narrow (max ~190 texels at 4096), so the
block-banded form moves a fraction of the bytes; wisdom
(autotune.learn_banded) already measured banded64 3.2x faster at this
size on the UPDATE shape, but the no-wisdom default heuristic
(`band > 2048`) misses because the cropped band is 1280.

Interleaves GLAVA_TPU_BANDED=0/1 arms round-robin in one process
(separate-process A/Bs draw independent tunnel weather; see
CLAUDE.md). presmooth_op's lru_cache is cleared per arm so the env
gate is re-read.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
        scripts/exp_banded_presmooth_ab.py [modules...] [--rounds=N]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

os.environ.setdefault("GLAVA_TPU_SLOPE_DELTA_MS", "250")

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from glava_tpu.config import loader  # noqa: E402
from glava_tpu.ops import smoothing  # noqa: E402
from glava_tpu.renderer import Renderer  # noqa: E402
from glava_tpu.utils.timing import probed_slope  # noqa: E402


def native_fps(module: str, banded: bool) -> float:
    os.environ["GLAVA_TPU_BANDED"] = "1" if banded else "0"
    smoothing.presmooth_op.cache_clear()  # env gate is read at build
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
    mods = [a for a in sys.argv[1:] if not a.startswith("--")] or [
        "bars", "radial"]
    rounds = 2
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=", 1)[1])
    res: dict = {}
    for rd in range(rounds):
        for m in mods:
            for arm in (False, True):
                f = native_fps(m, arm)
                key = (m, "banded" if arm else "dense")
                res.setdefault(key, []).append(round(f, 1))
                print(f"r{rd} {m:8s} {'banded' if arm else 'dense ':6s}: "
                      f"{f:8.1f} fps", flush=True)
    import statistics

    for m in mods:
        d = statistics.median(res[(m, "dense")])
        b = statistics.median(res[(m, "banded")])
        print(f"{m}: dense median {d:.0f} / banded median {b:.0f} "
              f"-> banded/dense {b / d:.2f}")
    print(res)
    os.environ.pop("GLAVA_TPU_BANDED", None)
    smoothing.presmooth_op.cache_clear()


if __name__ == "__main__":
    main()
