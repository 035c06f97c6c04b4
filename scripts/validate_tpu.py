#!/usr/bin/env python
"""End-to-end validation on the attached TPU (used between rounds).

Runs: golden test mode, fused-vs-unfused frame parity, the graft entry
compile check, and a short throughput sample. Exits nonzero on any
failure. CPU fallback works too (slower paths, unfused pipeline).
"""

import sys

sys.path.insert(0, ".")


def main() -> int:
    from glava_tpu.runtime.engine import _enable_compile_cache

    _enable_compile_cache()
    import numpy as np
    import jax
    import jax.numpy as jnp

    print(f"devices: {jax.devices()}")

    # 1. golden test mode (the reference's --run-tests)
    from glava_tpu.runtime.engine import Engine, EngineOptions

    eng = Engine(EngineOptions(audio_backend="synth", test_mode=True,
                               screen=(32, 32)))
    ok = eng.run_tests()
    print(f"golden: {'PASS' if ok else 'FAIL'}")
    if not ok:
        return 1

    # 2. fused vs unfused parity
    from glava_tpu.config import loader
    from glava_tpu.pipeline import AudioPipeline
    from glava_tpu.renderer import Renderer

    lc = loader.load(cli_requests=("setgeometry 0 0 256 128",
                                   "setprintframes false"),
                     force_module="bars")
    rng = np.random.default_rng(0)
    snap = jnp.asarray(rng.standard_normal((2, lc.cfg.bufsize))
                       .astype(np.float32) * 0.3)
    r1, r2 = Renderer(lc), Renderer(lc)
    # explicit fused-vs-unfused: the default is now the unfused XLA
    # path, so force the Pallas kernel on r1 (TPU only)
    if jax.default_backend() == "tpu":
        r1.pipeline = AudioPipeline(lc.cfg, r1.pipeline.uniforms,
                                    use_fused=True)
    r2.pipeline = AudioPipeline(lc.cfg, r2.pipeline.uniforms, use_fused=False)
    s1, s2 = r1.init_state(), r2.init_state()
    f1, f2 = r1.jit_step(), r2.jit_step()
    for _ in range(6):
        s1, a = f1(s1, snap, True, np.float32(0.0), np.float32(1.0),
                   np.float32(0.05), {})
        s2, b = f2(s2, snap, True, np.float32(0.0), np.float32(1.0),
                   np.float32(0.05), {})
    diff = float(np.abs(np.asarray(a) - np.asarray(b)).max())
    print(f"fused parity (fused={r1.pipeline.use_fused}): diff {diff:.2e}")
    if diff > 1e-3:
        return 1

    # 3. graft entry
    import __graft_entry__ as g

    fn, args = g.entry()
    _, frame = jax.jit(fn)(*args)
    jax.block_until_ready(frame)
    print(f"graft entry: {frame.shape}")

    # 4. throughput sample
    from glava_tpu.parallel.batch import BatchedRenderer, example_batch

    br = BatchedRenderer(lc, n_streams=16)
    pipe = br.renderer.pipeline
    ex = example_batch(br)

    # honest protocol: fresh audio per iteration (no loop-invariant
    # hoisting), completion forced via a scalar probe, slope timing
    def multi(chains, audio, gg):
        def body(c, k):
            a = audio * (1.0 + 1e-3 * k)
            return pipe.advance(c, a[:, 0, :], a[:, 1, :],
                                gravity_g=gg), None

        chains, _ = jax.lax.scan(body, chains,
                                 jnp.arange(32, dtype=jnp.float32))
        probe = jax.tree.leaves(chains)[0].ravel()[0]
        return chains, probe

    f = jax.jit(multi, donate_argnums=(0,))
    chains = pipe.init_state(batch=(16,))
    chains, probe = f(chains, ex["audio"], ex["gravity_g"])
    float(probe)

    def step_once():
        nonlocal chains
        chains, probe = f(chains, ex["audio"], ex["gravity_g"])
        return probe

    from glava_tpu.utils.timing import probed_slope

    rate = 16 * 32 / probed_slope(step_once, 3, 9)
    print(f"update throughput sample: {rate:,.0f} windows/s")
    print("ALL OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
