"""Headline benchmark: FFT windows/sec/chip on the batched pipeline.

Measures the full spectrum-update path (window + packed FFT + log-mag
+ gravity + average + smooth-pass resample — everything
``handle_audio`` does per update in the reference, render.c:2113-2309)
for a 64-stream batch at the reference's shipped config (bufsize 4096,
rc.glsl:190). One "window" = one stream-update (both channels).

Dispatches are amortized with lax.scan (the environment's TPU tunnel
has a ~0.3 ms per-dispatch floor that would otherwise dominate
device-side numbers; production engines pipeline dispatches the same
way). Also reports end-to-end frames/sec/stream for the bars module at
512x256 (BASELINE.json config #1) and single-dispatch p50 PCM->frame
latency including host transfers.

Prints the primary metric as one JSON line:
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
    S, K = 64, 64

    lc = loader.load(
        cli_requests=("setgeometry 0 0 512 256", "setprintframes false"),
        force_module="bars",
    )
    br = BatchedRenderer(lc, n_streams=S)
    pipe = br.renderer.pipeline
    ex = example_batch(br)

    # ---- windows/sec/chip: scan-amortized spectrum updates ---------------
    def multi_update(chains, audio, g):
        def body(c, _):
            c = pipe.advance(c, audio[:, 0, :], audio[:, 1, :], gravity_g=g)
            return c, None

        chains, _ = jax.lax.scan(body, chains, None, length=K)
        tex = pipe.textures_from(chains, audio[:, 0, :], audio[:, 1, :])
        return chains, tex

    f = jax.jit(multi_update, donate_argnums=(0,))
    chains = pipe.init_state(batch=(S,))
    chains, tex = f(chains, ex["audio"], ex["gravity_g"])
    jax.block_until_ready(tex)
    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        chains, tex = f(chains, ex["audio"], ex["gravity_g"])
    jax.block_until_ready(tex)
    dt = time.perf_counter() - t0
    windows_per_sec = S * K * iters / dt

    # ---- frames/sec/stream: full step incl. raster -----------------------
    KF = 16

    def multi_frames(state, audio, mod, tim, im, g):
        def body(s, _):
            s, _fr = br.step(s, audio, mod, tim, im, g, {})
            return s, None

        state, _ = jax.lax.scan(body, state, None, length=KF - 1)
        return br.step(state, audio, mod, tim, im, g, {})

    f2 = jax.jit(multi_frames, donate_argnums=(0,))
    st = br.init_state()
    st, fr = f2(st, ex["audio"], ex["modified"], ex["time"],
                ex["interp_mod"], ex["gravity_g"])
    jax.block_until_ready(fr)
    iters_f = 10
    t0 = time.perf_counter()
    for _ in range(iters_f):
        st, fr = f2(st, ex["audio"], ex["modified"], ex["time"],
                    ex["interp_mod"], ex["gravity_g"])
    jax.block_until_ready(fr)
    per_frame = (time.perf_counter() - t0) / (iters_f * KF)
    fps_per_stream = 1.0 / per_frame
    total_fps = S / per_frame

    # ---- BASELINE config #2: radial @1080p, 44.1 kHz ----------------------
    # Optional sections never break the headline JSON line the driver
    # consumes.
    radial_fps = None
    try:
        lc2 = loader.load(
            cli_requests=("setgeometry 0 0 1920 1080", "setsamplerate 44100",
                          "setprintframes false"),
            force_module="radial",
        )
        r2 = Renderer(lc2)
        rng = np.random.default_rng(0)
        snap2 = jnp.asarray(
            rng.standard_normal((2, lc2.cfg.bufsize)).astype(np.float32) * 0.3
        )
        g2 = jnp.float32(lc2.cfg.gravity_step / lc2.cfg.nominal_ups)

        def radial_frames(state, snap, g):
            def body(s, _):
                s, _fr = r2.step(s, snap, True, jnp.float32(0.1),
                                 jnp.float32(1.0), g, {})
                return s, None

            state, _ = jax.lax.scan(body, state, None, length=15)
            s2, fr = r2.step(state, snap, True, jnp.float32(0.1),
                             jnp.float32(1.0), g, {})
            return s2, jnp.clip(jnp.round(fr * 255.0), 0, 255).astype(jnp.uint8)

        fr_fn = jax.jit(radial_frames, donate_argnums=(0,))
        st2 = r2.init_state()
        st2, frame2 = fr_fn(st2, snap2, g2)
        jax.block_until_ready(frame2)
        t0 = time.perf_counter()
        for _ in range(5):
            st2, frame2 = fr_fn(st2, snap2, g2)
        jax.block_until_ready(frame2)
        radial_fps = 5 * 16 / (time.perf_counter() - t0)
    except Exception as e:
        print(f"radial bench skipped: {e}", file=__import__("sys").stderr)

    # ---- device-side p50 PCM->frame latency (single stream) -------------
    # BASELINE.md targets p50 < 5 ms for the PCM->frame step on the
    # device. The tunnel to this chip adds ~60 ms RTT per synchronous
    # host round-trip, so the honest device number is measured by
    # scan-amortizing KD full steps (spectrum chain + raster) per
    # dispatch and taking the median across trials; no host transfer
    # sits inside the timed region.
    device_p50_ms = None
    try:
        rd = Renderer(lc)
        gd = jnp.float32(lc.cfg.gravity_step / lc.cfg.nominal_ups)
        snapd = ex["audio"][0]
        KD = 32

        def dev_steps(state, snap, g):
            def body(s, _):
                s, _fr = rd.step(s, snap, True, jnp.float32(0.0),
                                 jnp.float32(1.0), g, {})
                return s, None

            state, _ = jax.lax.scan(body, state, None, length=KD - 1)
            return rd.step(state, snap, True, jnp.float32(0.0),
                           jnp.float32(1.0), g, {})

        fd = jax.jit(dev_steps, donate_argnums=(0,))
        std = rd.init_state()
        std, frd = fd(std, snapd, gd)
        jax.block_until_ready(frd)
        per_step = []
        for _ in range(15):
            t0 = time.perf_counter()
            std, frd = fd(std, snapd, gd)
            jax.block_until_ready(frd)
            per_step.append((time.perf_counter() - t0) / KD)
        device_p50_ms = float(np.median(per_step) * 1e3)
    except Exception as e:
        print(f"device-p50 bench skipped: {e}", file=__import__("sys").stderr)

    # ---- p50 PCM->frame latency (single stream, single dispatch) --------
    p50_ms = None
    try:
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
    except Exception as e:
        print(f"latency bench skipped: {e}", file=__import__("sys").stderr)

    result = {
        "metric": "fft_windows_per_sec_per_chip",
        "value": round(windows_per_sec, 1),
        "unit": "windows/s",
        "vs_baseline": round(windows_per_sec / 10_000.0, 3),
        "device": str(dev),
        "extra": {
            "streams": S,
            "bufsize": lc.cfg.bufsize,
            "fused_pallas": pipe.use_fused,
            "bars_fps_per_stream_512x256": round(fps_per_stream, 1),
            "total_fps_64streams": round(total_fps, 1),
            "radial_1080p_fps": round(radial_fps, 1) if radial_fps else None,
            # device-side time per full PCM->frame step (the latency a
            # locally-attached chip would see; the single-dispatch p50
            # below is dominated by this environment's network tunnel)
            "device_step_ms": round(per_frame * 1e3, 3),
            # first-class BASELINE target: device-side p50 of the full
            # single-stream PCM->frame step (<5 ms required)
            "device_p50_pcm_to_frame_ms": round(device_p50_ms, 3)
            if device_p50_ms else None,
            "p50_pcm_to_frame_ms_single_dispatch_tunnel": round(p50_ms, 3)
            if p50_ms else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
