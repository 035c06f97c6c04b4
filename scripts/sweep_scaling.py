#!/usr/bin/env python
"""Streams x bufsize throughput sweep on the update chain.

Shows where the chip saturates: windows/s and achieved algorithmic
GFLOP/s for streams in {64..1024} x bufsize in {1024, 4096,
16384}. Honest protocol throughout (scan-amortized, fresh audio per
iteration, scalar probes, two-point slopes). Output: a markdown table
on stdout (paste into docs/STATUS.md) + one JSON line on stderr.
"""

import json
import sys

sys.path.insert(0, ".")


def measure(streams: int, bufsize: int, scan_len: int = 32) -> dict:
    import numpy as np
    import jax
    import jax.numpy as jnp

    from glava_tpu.config.state import RenderConfig
    from glava_tpu.pipeline import AudioPipeline, UniformSpec
    from glava_tpu.utils.timing import probed_slope

    sys.path.insert(0, "scripts")
    import bench  # noqa: F401  (repo-root bench.py for _chain_flops)

    cfg = RenderConfig(bufsize=bufsize, samplesize=max(bufsize // 4, 256))
    chain = ("window", "fft", "gravity", "avg")
    uniforms = [UniformSpec("audio_l", "audio_l", chain),
                UniformSpec("audio_r", "audio_r", chain)]
    pipe = AudioPipeline(cfg, uniforms)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((streams, 2, bufsize)).astype(np.float32) * 0.3)
    g = jnp.full((streams,), 0.05, jnp.float32)

    def multi(chains, audio, g):
        def body(c, k):
            a = audio * (1.0 + 1e-3 * k)
            c = pipe.advance(c, a[:, 0, :], a[:, 1, :], gravity_g=g)
            return c, None

        chains, _ = jax.lax.scan(body, chains,
                                 jnp.arange(scan_len, dtype=jnp.float32))
        tex = pipe.textures_from(chains, audio[:, 0, :], audio[:, 1, :])
        probe = sum(t.ravel()[0] for t in tex.values())
        return chains, probe

    f = jax.jit(multi, donate_argnums=(0,))
    chains = pipe.init_state(batch=(streams,))
    chains, probe = f(chains, audio, g)
    float(probe)

    def once():
        nonlocal chains
        chains, probe = f(chains, audio, g)
        return probe

    dt = probed_slope(once, 3, 9) / scan_len
    wps = streams / dt
    from bench import _chain_flops_per_window

    fw = _chain_flops_per_window(pipe)
    return {
        "streams": streams, "bufsize": bufsize,
        "us_per_update": round(dt * 1e6, 1),
        "windows_per_s": round(wps, 1),
        "gflops": round(wps * fw / 1e9, 1),
    }


def main() -> None:
    from glava_tpu.runtime.engine import _enable_compile_cache

    _enable_compile_cache()
    rows = []
    for bufsize in (1024, 4096, 16384):
        for streams in (64, 128, 256, 512, 1024):
            try:
                rows.append(measure(streams, bufsize))
                print("done", rows[-1], file=sys.stderr)
            except Exception as e:
                print(f"skip S={streams} n={bufsize}: {e}", file=sys.stderr)
    print("| bufsize | streams | us/update | windows/s | alg GFLOP/s |")
    print("|---|---|---|---|---|")
    for r in rows:
        print(f"| {r['bufsize']} | {r['streams']} | {r['us_per_update']} "
              f"| {r['windows_per_s']:,.0f} | {r['gflops']} |")
    print(json.dumps(rows), file=sys.stderr)


if __name__ == "__main__":
    main()
