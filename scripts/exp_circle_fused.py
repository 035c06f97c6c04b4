"""A/B: fused scalar-field circle chain vs literal three-pass, on TPU.

Honest protocol (CLAUDE.md): scan-amortized frames with fresh audio per
iteration, every frame reduced into the carry, scalar probe fetch,
two-point slope. Run: python scripts/exp_circle_fused.py
"""

import os
import sys
import time

import numpy as np


def measure(scalar: str, module: str = "circle", screen=(1920, 1080),
            frames: int = 16):
    os.environ["GLAVA_TPU_CIRCLE_SCALAR"] = scalar
    import jax
    import jax.numpy as jnp
    from glava_tpu.config import loader
    from glava_tpu.renderer import Renderer

    lcm = loader.load(
        cli_requests=(f"setgeometry 0 0 {screen[0]} {screen[1]}",
                      "setprintframes false"),
        force_module=module,
    )
    rm = Renderer(lcm)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(
        rng.standard_normal((2, lcm.cfg.bufsize)).astype(np.float32) * 0.3)
    g = jnp.float32(lcm.cfg.gravity_step / lcm.cfg.nominal_ups)

    def mod_frames(state, snap, g):
        def body(carry, k):
            s, acc = carry
            a = snap * (1.0 + 1e-3 * k)
            s, fr = rm.step(s, a, True, jnp.float32(0.1),
                            jnp.float32(1.0), g, {})
            return (s, acc + fr.sum()), None

        (s2, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)),
            jnp.arange(frames, dtype=jnp.float32))
        return s2, acc

    fm = jax.jit(mod_frames, donate_argnums=(0,))
    stm = rm.init_state()
    stm, probe = fm(stm, snap, g)
    ref = float(probe)

    def once(n):
        nonlocal stm
        t0 = time.perf_counter()
        for _ in range(n):
            stm, probe = fm(stm, snap, g)
        float(probe)
        return time.perf_counter() - t0

    once(2)  # warm
    n1, n2 = 3, 9
    t1, t2 = once(n1), once(n2)
    per_call = (t2 - t1) / (n2 - n1)
    fps = frames / per_call
    return fps, ref


def main():
    from glava_tpu.runtime.engine import _enable_compile_cache
    _enable_compile_cache()
    import jax
    print("backend:", jax.default_backend(), file=sys.stderr)

    fps1, ref1 = measure("1")
    print(f"circle@1080p fused   : {fps1:,.0f} fps (probe {ref1:.4f})")
    fps0, ref0 = measure("0")
    print(f"circle@1080p literal : {fps0:,.0f} fps (probe {ref0:.4f})")
    print(f"speedup: {fps1 / fps0:.2f}x; probe rel diff "
          f"{abs(ref1 - ref0) / max(abs(ref0), 1e-9):.2e}")


if __name__ == "__main__":
    main()
