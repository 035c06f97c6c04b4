"""Headline benchmark: FFT windows/sec/chip on the batched pipeline.

Measures the full spectrum-update path (window + packed FFT + log-mag
+ gravity + average + smooth-pass resample — everything
``handle_audio`` does per update in the reference, render.c:2113-2309)
for a 64-stream batch at the reference's shipped config (bufsize 4096,
rc.glsl:190). One "window" = one stream-update (both channels).

Measurement protocol (important on this environment; centralized in
glava_tpu/utils/timing.py):

* Dispatches amortize with ``lax.scan`` (the TPU tunnel has a
  per-dispatch floor that would otherwise dominate device numbers).
* ``jax.block_until_ready`` is NOT trusted — on the axon runtime it
  can return before execution (and even before compilation) completes.
  Every timed region ends by fetching a scalar probe that the jitted
  function returns, which forces real completion.
* Every scan iteration sees FRESH audio (else XLA hoists the FFT out
  of the loop) and every frame is reduced into the scan carry (else
  rasters are dead code).
* Per-iteration time is a two-point slope, cancelling the constant
  probe-fetch RTT and enqueue overheads.

Prints the primary metric as one JSON line:
target >= 10,000 windows/sec/chip (BASELINE.md).
"""

from __future__ import annotations

import json
import time
from dataclasses import replace

import numpy as np

from glava_tpu.utils.timing import probed_slope


def _chain_flops_per_window(pipe) -> int:
    """Algorithmic FLOPs of ONE stream-update (both channels) through
    the shipped chain: window + four-step packed FFT + log-mag/boost +
    gravity + age-weighted averaging + presmooth resample matmul.
    Matmul FLOPs are 2*M*N*K; elementwise ops counted once each."""
    from glava_tpu.ops.fft import _split

    n = pipe.sz
    m = n // 2
    m1, m2 = _split(m) if m > 256 else (m, 1)
    U = 2  # audio_l + audio_r
    fft = 8 * m * (m1 + m2) + 6 * m if m2 > 1 else 8 * m * m1
    window = n
    logmag = 4 * n            # abs, log, div, boost-mul (max folded)
    gravity = 3 * n           # max, sub, clip
    F = pipe.cfg.avg_frames
    avg = 2 * F * n + n       # weighted ring reduction + clip
    presmooth = 0
    if pipe.presmooth is not None and pipe.presmooth.matrix is not None:
        P, band = pipe.presmooth.matrix.shape
        presmooth = 2 * P * band
    elif pipe.presmooth is not None and pipe.presmooth.banded is not None:
        B, R, Kb = pipe.presmooth.banded.blocks.shape
        presmooth = 2 * B * R * Kb  # block-banded einsum work
    return U * (window + fft + logmag + gravity + avg + presmooth)


_PEAK_BF16 = {
    # dense bf16 peak FLOP/s per chip (public spec sheets)
    "TPU v5 lite": 197e12,
    "TPU v4": 275e12,
    "TPU v6 lite": 918e12,
}


def _path_wisdom(pipe) -> dict:
    """The persisted XLA-vs-Pallas choice for the shipped shape."""
    try:
        from glava_tpu.ops import autotune

        return autotune.selected_path(pipe.sz, pipe.cfg.avg_frames)
    except Exception:
        return {"path": "xla", "source": "default"}


def main() -> None:
    import os

    # jitter-proof slopes: scale run lengths until the slope delta
    # dominates the tunnel's RTT variance (GLAVA_TPU_SLOPE_DELTA_MS=0
    # restores the fixed-length protocol). The "±2-3x fusion lottery"
    # across fresh builds was THIS measurement noise — identical
    # builds fingerprint to byte-identical optimized HLO.
    os.environ.setdefault("GLAVA_TPU_SLOPE_DELTA_MS", "250")

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
        def body(c, k):
            a = audio * (1.0 + 1e-3 * k)
            c = pipe.advance(c, a[:, 0, :], a[:, 1, :], gravity_g=g)
            return c, None

        chains, _ = jax.lax.scan(body, chains,
                                 jnp.arange(K, dtype=jnp.float32))
        tex = pipe.textures_from(chains, audio[:, 0, :], audio[:, 1, :])
        probe = sum(t.ravel()[0] for t in tex.values())
        return chains, probe

    f = jax.jit(multi_update, donate_argnums=(0,))
    chains = pipe.init_state(batch=(S,))
    chains, probe = f(chains, ex["audio"], ex["gravity_g"])
    float(probe)  # forces compile + first execution

    def upd_once():
        nonlocal chains
        chains, probe = f(chains, ex["audio"], ex["gravity_g"])
        return probe

    windows_per_sec = S * K / probed_slope(upd_once)

    # ---- roofline: achieved FLOP/s on the update chain -------------------
    # Algorithmic (f32) FLOPs; the HIGHEST-precision policy executes
    # each f32 matmul as a 6-pass bf16 decomposition on the MXU, so
    # hardware-executed FLOPs are ~6x the algorithmic count for the
    # matmul share. Both views are reported; the sweep in
    # scripts/sweep_scaling.py shows where the chip saturates.
    flops_w = _chain_flops_per_window(pipe)
    achieved = windows_per_sec * flops_w
    peak = _PEAK_BF16.get(dev.device_kind)
    roofline = {
        "flops_per_window": flops_w,
        "achieved_gflops_algorithmic": round(achieved / 1e9, 2),
        "pct_bf16_peak_algorithmic": (
            round(100.0 * achieved / peak, 4) if peak else None
        ),
        "note": ("update chain is bandwidth/latency-bound at these "
                 "shapes, not MXU-bound; see docs/STATUS.md sweep"),
    }

    # ---- frames/sec/stream: full step incl. raster -----------------------
    KF = 16

    def multi_frames(state, audio, mod, tim, im, g):
        def body(carry, k):
            s, acc = carry
            a = audio * (1.0 + 1e-3 * k)
            s, fr = br.step(s, a, mod, tim, im, g, {})
            return (s, acc + fr.sum()), None

        (state, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)),
            jnp.arange(KF, dtype=jnp.float32))
        return state, acc

    f2 = jax.jit(multi_frames, donate_argnums=(0,))
    st = br.init_state()
    st, probe = f2(st, ex["audio"], ex["modified"], ex["time"],
                   ex["interp_mod"], ex["gravity_g"])
    float(probe)

    def frames_once():
        nonlocal st
        st, probe = f2(st, ex["audio"], ex["modified"], ex["time"],
                       ex["interp_mod"], ex["gravity_g"])
        return probe

    per_frame = probed_slope(frames_once) / KF
    fps_per_stream = 1.0 / per_frame
    total_fps = S / per_frame

    # ---- single-stream 1080p module sections ------------------------------
    # (radial = BASELINE config #2; circle exercises the Pallas
    # lane-shuffle lookup). Optional sections never break the headline
    # JSON line the driver consumes.
    def module_fps_1080p(module: str, extra: tuple = (),
                         builds: int = 3) -> dict | None:
        """Stats over ``builds`` FRESH builds: identical code draws a
        ±2-3x compile/fusion lottery across builds even in one process
        (docs/STATUS.md: interpreted bars 3,813/4,167/7,703 fps), so a
        point sample cannot be compared across rounds.  ``min`` is the
        floor a user can rely on — the only cross-round-comparable
        number; ``best`` shows the lottery ceiling.  Within-build noise
        only ever slows a run; the median-of-slopes + physical-ceiling
        guards catch collapsed-slope fast reads."""
        import statistics

        vals = [module_fps_1080p_once(module, extra)
                for _ in range(max(builds, 1))]
        vals = sorted(v for v in vals if v is not None)
        if not vals:
            return None
        return {
            "min": round(vals[0], 1),
            "median": round(statistics.median(vals), 1),
            "best": round(vals[-1], 1),
            "builds": len(vals),
        }

    def module_fps_1080p_once(module: str, extra: tuple = ()) -> float | None:
        try:
            lcm = loader.load(
                cli_requests=("setgeometry 0 0 1920 1080",
                              "setprintframes false") + extra,
                force_module=module,
            )
            rm = Renderer(lcm)
            rng = np.random.default_rng(0)
            snap = jnp.asarray(
                rng.standard_normal((2, lcm.cfg.bufsize)).astype(np.float32)
                * 0.3
            )
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
                    jnp.arange(16, dtype=jnp.float32))
                return s2, acc

            fm = jax.jit(mod_frames, donate_argnums=(0,))
            stm = rm.init_state()
            stm, probe = fm(stm, snap, g)
            float(probe)

            def mod_once():
                nonlocal stm
                stm, probe = fm(stm, snap, g)
                return probe

            fps = 16.0 / probed_slope(mod_once, 3, 9)
            if fps > 25_000:
                # physical ceiling: a 1080p RGBA raster writes
                # >= 33 MB/frame; faster than ~25k fps exceeds HBM
                # bandwidth, so the slope collapsed under link jitter
                # — remeasure at longer runs and keep the smaller
                fps = min(fps, 16.0 / probed_slope(mod_once, 6, 18,
                                                   repeats=3))
            return fps
        except Exception as e:
            print(f"{module} bench skipped: {e}",
                  file=__import__("sys").stderr)
            return None

    radial_fps = module_fps_1080p("radial", ("setsamplerate 44100",))
    circle_fps = module_fps_1080p("circle")
    graph_fps = module_fps_1080p("graph")    # BASELINE config #3
    wave_fps = module_fps_1080p("wave")      # BASELINE config #3

    # ---- 64-stream HETEROGENEOUS fleet step (BASELINE config #4) ---------
    # different modules per stream in ONE jitted step (MixedBatchedRenderer)
    fleet_fps = None
    try:
        from glava_tpu.parallel.batch import MixedBatchedRenderer

        variants = [
            loader.load(cli_requests=("setgeometry 0 0 512 256",
                                      "setprintframes false"),
                        force_module=m)
            for m in ("bars", "radial", "wave", "circle")
        ]
        assign = [i % 4 for i in range(S)]
        mbr = MixedBatchedRenderer(variants, assign)

        class _Ex:  # example_batch only reads n_streams + cfg
            n_streams, cfg = S, mbr.cfg

        exm = example_batch(_Ex())
        KM = 8

        def mixed_frames(state, audio, mod, tim, im, g):
            def body(carry, k):
                s, acc = carry
                a = audio * (1.0 + 1e-3 * k)
                s, fr = mbr.step(s, a, mod, tim, im, g, {})
                return (s, acc + fr.sum()), None

            (state, acc), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)),
                jnp.arange(KM, dtype=jnp.float32))
            return state, acc

        fm = jax.jit(mixed_frames, donate_argnums=(0,))
        stm = mbr.init_state()
        stm, probe = fm(stm, exm["audio"], exm["modified"], exm["time"],
                        exm["interp_mod"], exm["gravity_g"])
        float(probe)

        def mixed_once():
            nonlocal stm
            stm, probe = fm(stm, exm["audio"], exm["modified"], exm["time"],
                            exm["interp_mod"], exm["gravity_g"])
            return probe

        # median-of-3 slopes: this number is judged against the
        # >= 500 fps/stream target and tunnel drift has swung single
        # draws 462-529 across sessions; a true median (repeats=3)
        # discards one bad sample in either direction
        per = probed_slope(mixed_once, 3, 9, repeats=3) / KM
        fleet_fps = {"fps_per_stream": round(1.0 / per, 1),
                     "total_fps": round(S / per, 1),
                     # device-side PCM->frame latency of the whole
                     # 64-stream heterogeneous step (VERDICT r3 #7)
                     "p50_pcm_to_frame_ms": round(per * 1e3, 3),
                     "modules": "bars/radial/wave/circle x16 each"}
    except Exception as e:
        print(f"heterogeneous fleet bench skipped: {e}",
              file=__import__("sys").stderr)

    # ---- interpreted-verbatim section (reference shaders @1080p) ---------
    # the FULL six-way sweep (VERDICT r3 #7): every shipped reference
    # shader through the compatibility interpreter, plus graph's
    # ANTI_ALIAS pass (data-dependent boundary walks -> first-hit
    # column scans + the Pallas latch scan)
    interp = {}
    try:
        import importlib.util as _ilu
        from pathlib import Path

        spec = _ilu.spec_from_file_location(
            "bench_interpreted",
            Path(__file__).parent / "scripts" / "bench_interpreted.py")
        bi = _ilu.module_from_spec(spec)
        spec.loader.exec_module(bi)
        for mod, knobs in (("bars", ""), ("radial", ""), ("graph", ""),
                           ("graph_aa", "#define ANTI_ALIAS 1\n"),
                           ("wave", ""), ("circle", "")):
            try:
                src = "graph" if mod == "graph_aa" else mod
                # {min, median, best} over 3 fresh builds — the fusion
                # lottery made point samples round-incomparable
                interp[mod] = bi.bench_module_stats(src, knobs=knobs)
            except Exception as e:
                interp[mod] = None
                print(f"interpreted {mod} skipped: {e}",
                      file=__import__("sys").stderr)
    except Exception as e:
        print(f"interpreted bench skipped: {e}",
              file=__import__("sys").stderr)

    # ---- large-bufsize (banded-resample) update points -------------------
    # bufsize >= ~6k routes the presmooth resample through the
    # block-banded einsum (ops/smoothing.Banded); these points pin the
    # big-buffer regime every round (VERDICT r3 #7/#8)
    big_buf = {}
    for bs in (8192, 16384):
        try:
            from glava_tpu.pipeline import AudioPipeline, UniformSpec

            cfgb = replace(lc.cfg, bufsize=bs)
            pipeb = AudioPipeline(
                cfgb,
                [UniformSpec("audio_l", "audio_l",
                             ("window", "fft", "gravity", "avg")),
                 UniformSpec("audio_r", "audio_r",
                             ("window", "fft", "gravity", "avg"))],
            )
            Sb = 64
            stb = pipeb.init_state(batch=(Sb,))
            rngb = np.random.default_rng(2)
            audb = jnp.asarray(
                rngb.standard_normal((Sb, 2, bs)).astype(np.float32) * 0.3)
            gb = jnp.float32(cfgb.gravity_step / cfgb.nominal_ups)
            KB = 16

            def many_b(chains, audio, g, pipeb=pipeb, KB=KB):
                def body(c, k):
                    a = audio * (1.0 + 1e-3 * k)
                    c2 = pipeb.advance(c, a[:, 0], a[:, 1], gravity_g=g)
                    probe = sum(
                        jnp.sum(x) for x in jax.tree_util.tree_leaves(c2)
                        if hasattr(x, "dtype")
                        and jnp.issubdtype(x.dtype, jnp.floating))
                    return c2, probe

                c2, props = jax.lax.scan(
                    body, chains, jnp.arange(KB, dtype=jnp.float32))
                return c2, props.sum()

            jb = jax.jit(many_b, donate_argnums=(0,))
            stb, pb = jb(stb, audb, gb)
            float(pb)
            holder = [stb]

            def once_b():
                holder[0], p = jb(holder[0], audb, gb)
                return p

            us = probed_slope(once_b, 3, 9) / KB * 1e6
            big_buf[str(bs)] = {
                "us_per_update_64streams": round(us, 1),
                "windows_per_s": round(Sb * 1e6 / us, 1),
            }
        except Exception as e:
            big_buf[str(bs)] = None
            print(f"bufsize {bs} bench skipped: {e}",
                  file=__import__("sys").stderr)

    # ---- saturated-chip throughput (the scale-out headline) --------------
    # The streams x bufsize sweep (docs/STATUS.md) shows the update
    # chain saturating around 256 streams at bufsize 1024 (~4M
    # windows/s); publish that point in the artifact, plus a 256-stream
    # heterogeneous SERVING step (the data-parallel axis a deployment
    # actually scales).
    saturated = {}
    try:
        from glava_tpu.pipeline import AudioPipeline, UniformSpec

        Ssat, KS = 256, 16
        cfgs = replace(lc.cfg, bufsize=1024)
        pipes = AudioPipeline(
            cfgs,
            [UniformSpec("audio_l", "audio_l",
                         ("window", "fft", "gravity", "avg")),
             UniformSpec("audio_r", "audio_r",
                         ("window", "fft", "gravity", "avg"))],
        )
        rngs = np.random.default_rng(5)
        auds = jnp.asarray(
            rngs.standard_normal((Ssat, 2, 1024)).astype(np.float32) * 0.3)
        gs = jnp.float32(cfgs.gravity_step / cfgs.nominal_ups)

        def many_s(chains, audio, g):
            def body(c, k):
                a = audio * (1.0 + 1e-3 * k)
                c = pipes.advance(c, a[:, 0], a[:, 1], gravity_g=g)
                return c, None

            c2, _ = jax.lax.scan(body, chains,
                                 jnp.arange(KS, dtype=jnp.float32))
            tex = pipes.textures_from(c2, audio[:, 0], audio[:, 1])
            return c2, sum(t.ravel()[0] for t in tex.values())

        js = jax.jit(many_s, donate_argnums=(0,))
        sts = pipes.init_state(batch=(Ssat,))
        sts, ps = js(sts, auds, gs)
        float(ps)
        holder_s = [sts]

        def once_s():
            holder_s[0], p = js(holder_s[0], auds, gs)
            return p

        dt_s = probed_slope(once_s, 2, 6) / KS
        saturated["update_256streams_bufsize1024"] = {
            "windows_per_s": round(Ssat / dt_s, 1),
            "us_per_update": round(dt_s * 1e6, 1),
        }
    except Exception as e:
        print(f"saturated update bench skipped: {e}",
              file=__import__("sys").stderr)
    try:
        from glava_tpu.parallel.batch import MixedBatchedRenderer

        Ssf, KSF = 256, 4
        variants_s = [
            loader.load(cli_requests=("setgeometry 0 0 512 256",
                                      "setprintframes false"),
                        force_module=m)
            for m in ("bars", "radial", "wave", "circle")
        ]
        mbr_s = MixedBatchedRenderer(variants_s,
                                     [i % 4 for i in range(Ssf)])

        class _ExS:
            n_streams, cfg = Ssf, mbr_s.cfg

        exs = example_batch(_ExS())

        def mixed_s(state, audio, mod, tim, im, g):
            def body(carry, k):
                s, acc = carry
                a = audio * (1.0 + 1e-3 * k)
                s, fr = mbr_s.step(s, a, mod, tim, im, g, {})
                return (s, acc + fr.sum()), None

            (state, acc), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)),
                jnp.arange(KSF, dtype=jnp.float32))
            return state, acc

        fms = jax.jit(mixed_s, donate_argnums=(0,))
        stms = mbr_s.init_state()
        stms, probe = fms(stms, exs["audio"], exs["modified"],
                          exs["time"], exs["interp_mod"],
                          exs["gravity_g"])
        float(probe)

        def mixed_s_once():
            nonlocal stms
            stms, probe = fms(stms, exs["audio"], exs["modified"],
                              exs["time"], exs["interp_mod"],
                              exs["gravity_g"])
            return probe

        per_s = probed_slope(mixed_s_once, 2, 6, repeats=3) / KSF
        saturated["fleet_256streams_512x256"] = {
            "fps_per_stream": round(1.0 / per_s, 1),
            "total_fps": round(Ssf / per_s, 1),
            "p50_pcm_to_frame_ms": round(per_s * 1e3, 3),
            "modules": "bars/radial/wave/circle x64 each",
        }
    except Exception as e:
        print(f"saturated fleet bench skipped: {e}",
              file=__import__("sys").stderr)

    # ---- device-side p50 PCM->frame latency (single stream) -------------
    # BASELINE.md targets p50 < 5 ms for the PCM->frame step on the
    # device; scan-amortize KD full steps per dispatch and take the
    # median of per-dispatch slopes.
    device_p50_ms = None
    try:
        rd = Renderer(lc)
        gd = jnp.float32(lc.cfg.gravity_step / lc.cfg.nominal_ups)
        snapd = ex["audio"][0]
        KD = 32

        def dev_steps(state, snap, g):
            def body(carry, k):
                s, acc = carry
                a = snap * (1.0 + 1e-3 * k)
                s, fr = rd.step(s, a, True, jnp.float32(0.0),
                                jnp.float32(1.0), g, {})
                return (s, acc + fr.sum()), None

            (state, acc), _ = jax.lax.scan(
                body, (state, jnp.float32(0.0)),
                jnp.arange(KD, dtype=jnp.float32))
            return state, acc

        fd = jax.jit(dev_steps, donate_argnums=(0,))
        std = rd.init_state()
        std, probe = fd(std, snapd, gd)
        float(probe)

        def dev_once():
            nonlocal std
            std, probe = fd(std, snapd, gd)
            return probe

        samples = [probed_slope(dev_once, 3, 9, repeats=1) / KD
                   for _ in range(7)]
        device_p50_ms = float(np.median(samples) * 1e3)
    except Exception as e:
        print(f"device-p50 bench skipped: {e}", file=__import__("sys").stderr)

    # ---- BASELINE stretch config #5: 80-bin log-mel frontend ------------
    # Whisper-style features (512-pt frames, 80 mels) through the same
    # packed-FFT matmuls; honest protocol (scan, fresh frames per
    # iteration, scalar probe, two-point slope).
    logmel_frames_per_s = None
    try:
        from glava_tpu.models import mel as mel_mod

        BM, KM = 1024, 16
        rngm = np.random.default_rng(11)
        frm = jnp.asarray(
            rngm.standard_normal((BM, 512)).astype(np.float32) * 0.2)

        def mel_scan(frames0):
            def body(acc, k):
                feats = mel_mod.log_mel(frames0 * (1.0 + 1e-3 * k))
                # FULL reduction into the carry: probing single
                # elements would let XLA narrow the mel matmul to the
                # probed rows (the raster-DCE failure mode in the
                # measurement protocol)
                return acc + feats.sum(), None

            acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                                  jnp.arange(KM, dtype=jnp.float32))
            return acc

        jm = jax.jit(mel_scan)
        float(jm(frm))

        def mel_once():
            return jm(frm)

        dt_mel = probed_slope(mel_once, 2, 6) / KM
        logmel_frames_per_s = BM / dt_mel
    except Exception as e:
        print(f"logmel bench skipped: {e}", file=__import__("sys").stderr)

    # ---- p50 PCM->frame latency (single stream, single dispatch) --------
    # Includes the synchronous host round trip — tunnel-bound in this
    # environment; np.asarray is a true fetch so this was always honest.
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
            # which update path the wisdom selected and the head-to-head
            # numbers that justified it (ops/autotune.learn_path)
            "path_wisdom": _path_wisdom(pipe),
            "roofline": roofline,
            "bars_fps_per_stream_512x256": round(fps_per_stream, 1),
            "total_fps_64streams": round(total_fps, 1),
            "radial_1080p_fps": radial_fps,
            "circle_1080p_fps": circle_fps,
            "graph_1080p_fps": graph_fps,
            "wave_1080p_fps": wave_fps,
            "heterogeneous_fleet_64": fleet_fps,
            # saturated-chip scale-out points (update sweep knee +
            # 256-stream heterogeneous serving step)
            "saturated": saturated or None,
            "interpreted_verbatim_1080p_fps": interp or None,
            "bufsize_scaling": big_buf or None,
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
            # BASELINE stretch config #5: Whisper-style 80-bin log-mel
            # frames/s through the shared packed-FFT matmuls
            "logmel_frames_per_s": round(logmel_frames_per_s, 1)
            if logmel_frames_per_s else None,
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
