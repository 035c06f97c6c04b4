"""Offline (faster-than-realtime) rendering: WAV in, frame stream out.

The reference can only visualize live audio at wall-clock speed (its
loop is paced by the capture thread). With compute decoupled from
presentation, a recorded track can be rendered as fast as the chip
allows: the exact realtime schedule — hop-cadence ring updates
(fifo.c:91-92), per-frame keyframe interpolation (render.c:1792-1809),
nominal-UPS gravity decay (render.c:728) — is precomputed on the host,
and frames are produced in scan-amortized device chunks.

Because the offline clock is exact, the measured-UPS feedback loop of
the realtime engine collapses to the true update rate (rate / hop), so
offline output is deterministic for a given track + config.

    glava-tpu --offline -a wav -r 'setsource "track.wav"' \
              --sink y4m:out.y4m

Environment note: on this repo's tunneled TPU the chunk fetches are
host-transfer-bound (~25 MB/s), capping offline speed around realtime
at small sizes; on locally-attached hardware the fetch is PCIe and the
chip-side frame rate (hundreds to thousands of fps) is the limit.
"""

from __future__ import annotations

import time as _time

import numpy as np

from glava_tpu.config.loader import LoadedConfig
from glava_tpu.pipeline import frame_windows
from glava_tpu.renderer import Renderer
from glava_tpu.runtime.audio.wav import read_wav
from glava_tpu.runtime.sinks import FrameSink


def _schedule(n_samples: int, rate: int, hop: int, fps: float,
              timecycle: float):
    """Per-frame inputs mirroring the engine loop's bookkeeping."""
    ups = rate / hop
    n_frames = max(int(n_samples / rate * fps), 1)
    t = np.arange(n_frames) / fps
    # window j holds samples ending at (j+1)*hop (frame_windows): the
    # newest complete window at time t
    widx = np.floor(t * rate / hop).astype(np.int64) - 1
    widx = np.clip(widx, 0, max(n_samples // hop - 1, 0))
    modified = np.empty(n_frames, bool)
    modified[0] = True
    modified[1:] = widx[1:] != widx[:-1]
    # kcounter/uratio interpolation (engine.py run(); render.c:1792-1809)
    kcounter = np.zeros(n_frames, np.int64)
    for k in range(1, n_frames):
        kcounter[k] = 0 if modified[k] else kcounter[k - 1] + 1
    uratio = min(ups / max(fps, 1.0), 1.0)
    interp = np.minimum(uratio * np.maximum(kcounter, 1), 1.0)
    return dict(
        widx=widx,
        modified=modified,
        interp=interp.astype(np.float32),
        time=(t % timecycle).astype(np.float32),
        ups=ups,
        n_frames=n_frames,
    )


def render_wav(loaded: LoadedConfig, wav_path: str, sink: FrameSink,
               fps: float = 60.0, screen: tuple[int, int] | None = None,
               chunk: int = 64, verbose: bool = False) -> int:
    """Render the whole track through ``sink``; returns frames written."""
    import jax
    import jax.numpy as jnp

    from glava_tpu.runtime.engine import _enable_compile_cache

    _enable_compile_cache()  # the chunk scan is a big one-time compile

    cfg = loaded.cfg
    left, right, rate = read_wav(wav_path)
    if rate != cfg.sample_rate:
        n = int(len(left) * cfg.sample_rate / rate)
        xs = np.linspace(0, len(left) - 1, n)
        left = np.interp(xs, np.arange(len(left)), left).astype(np.float32)
        right = np.interp(xs, np.arange(len(right)), right).astype(np.float32)
        rate = cfg.sample_rate
    hop = max(cfg.samplesize // 4, 1)
    wl = frame_windows(left, cfg.bufsize, hop)
    wr = frame_windows(right, cfg.bufsize, hop)
    if len(wl) == 0:
        # track shorter than one hop: render it as one silence-padded
        # window (the realtime ring would hold mostly zeros too)
        wl = np.zeros((1, cfg.bufsize), np.float32)
        wr = np.zeros((1, cfg.bufsize), np.float32)
        wl[0, -len(left):] = left
        wr[0, -len(right):] = right
    sched = _schedule(len(left), rate, hop, fps, cfg.timecycle)
    g = np.float32(cfg.gravity_step / sched["ups"])

    r = Renderer(loaded, screen=screen)

    def chunk_fn(state, audio, modified, tim, interp):
        def body(s, x):
            a, m, ti, im = x
            s, fr = r.step(s, a, m, ti, im, g, {})
            q = jnp.clip(jnp.round(fr * 255.0), 0, 255).astype(jnp.uint8)
            return s, q
        return jax.lax.scan(body, state, (audio, modified, tim, interp))

    step = jax.jit(chunk_fn, donate_argnums=(0,))
    state = r.init_state()
    T = sched["n_frames"]
    written = 0
    t0 = _time.monotonic()
    for start in range(0, T, chunk):
        end = min(start + chunk, T)
        n = end - start

        def seg(key, pad_edge=True):
            a = sched[key][start:end]
            if n < chunk:  # pad the tail: one compiled shape; padded
                #            frames trail the track and are discarded
                a = np.concatenate([a, np.repeat(a[-1:], chunk - n, 0)])
            return a

        idx = seg("widx")
        audio = jnp.asarray(
            np.stack([wl[idx], wr[idx]], axis=1)  # (chunk, 2, bufsize)
        )
        state, frames = step(
            state, audio,
            jnp.asarray(seg("modified")),
            jnp.asarray(seg("time")),
            jnp.asarray(seg("interp")),
        )
        host = np.asarray(frames)  # one D2H per chunk
        for k in range(n):
            sink.submit(host[k], float(sched["time"][start + k]))
            written += 1
    if verbose:
        dt = _time.monotonic() - t0
        print(f"offline: {written} frames in {dt:.2f}s "
              f"({written / max(dt, 1e-9):.0f} fps, "
              f"{written / fps / max(dt, 1e-9):.1f}x realtime)")
    return written
