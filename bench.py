"""Headline benchmark: FFT windows/sec/chip on the batched pipeline.

Measures the full spectrum-update path (window + packed FFT + log-mag
+ gravity + average + smooth-pass resample, i.e. everything
``handle_audio`` does per update in the reference, render.c:2113-2309)
for a 64-stream batch at the reference's shipped config (bufsize 4096,
rc.glsl:190). One "window" = one stream-update.

Also measures end-to-end frames/sec/stream for the bars module at
512x256 (BASELINE.json config #1) and p50 PCM->frame latency, and
reports the primary metric as JSON on the last line:
target >= 10,000 windows/sec/chip (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from glava_tpu.config import loader
    from glava_tpu.parallel.batch import BatchedRenderer, example_batch
    from glava_tpu.renderer import Renderer

    dev = jax.devices()[0]
    S = 64

    # ---- windows/sec/chip: batched spectrum update ----------------------
    lc = loader.load(
        cli_requests=("setgeometry 0 0 512 256", "setprintframes false"),
        force_module="bars",
    )
    br = BatchedRenderer(lc, n_streams=S)
    ex = example_batch(br)
    chains = br.renderer.pipeline.init_state(batch=(S,))

    upd = jax.jit(br.update_textures, donate_argnums=(0,))
    chains, tex = upd(chains, ex["audio"], ex["gravity_g"])
    jax.block_until_ready(tex)

    iters = 200
    t0 = time.perf_counter()
    for _ in range(iters):
        chains, tex = upd(chains, ex["audio"], ex["gravity_g"])
    jax.block_until_ready(tex)
    dt = time.perf_counter() - t0
    windows_per_sec = S * iters / dt

    # ---- frames/sec/stream: full step incl. raster -----------------------
    step = jax.jit(br.step, donate_argnums=(0,))
    state = br.init_state()
    state, frame = step(state, ex["audio"], ex["modified"], ex["time"],
                        ex["interp_mod"], ex["gravity_g"], {})
    jax.block_until_ready(frame)
    iters_f = 50
    t0 = time.perf_counter()
    for _ in range(iters_f):
        state, frame = step(state, ex["audio"], ex["modified"], ex["time"],
                            ex["interp_mod"], ex["gravity_g"], {})
    jax.block_until_ready(frame)
    dt_f = time.perf_counter() - t0
    fps_per_stream = iters_f / dt_f  # all S streams advance together
    total_fps = S * iters_f / dt_f

    # ---- p50 PCM->frame latency (single stream, incl. H2D + D2H) --------
    r1 = Renderer(lc)
    st1 = r1.init_state()
    step1 = r1.jit_step()
    snap = np.asarray(ex["audio"][0])
    g = np.float32(lc.cfg.gravity_step / lc.cfg.nominal_ups)
    st1, f1 = step1(st1, jnp.asarray(snap), True, np.float32(0.0),
                    np.float32(1.0), g, {})
    np.asarray(f1)
    lats = []
    for _ in range(30):
        t0 = time.perf_counter()
        st1, f1 = step1(st1, jnp.asarray(snap), True, np.float32(0.0),
                        np.float32(1.0), g, {})
        np.asarray(f1)  # device->host, the full PCM->pixels path
        lats.append(time.perf_counter() - t0)
    p50_ms = float(np.median(lats) * 1e3)

    result = {
        "metric": "fft_windows_per_sec_per_chip",
        "value": round(windows_per_sec, 1),
        "unit": "windows/s",
        "vs_baseline": round(windows_per_sec / 10_000.0, 3),
        "device": str(dev),
        "extra": {
            "streams": S,
            "bufsize": lc.cfg.bufsize,
            "bars_fps_per_stream_512x256": round(fps_per_stream, 1),
            "total_fps_64streams": round(total_fps, 1),
            "p50_pcm_to_frame_ms": round(p50_ms, 3),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
