"""Engine: the glava_entry / rd_update frame loop on a TPU program.

Replicates the reference's process structure (glava/glava.c:291-577):
audio backend thread -> mutex ring -> per-frame snapshot -> device step
-> frame sink, with the atomic control surface embedders use
(glava.h:14-26): ``wait``, ``tex``, ``sizereq``, ``terminate``,
``reload``.

Loop mechanics carried over:

* UPS/FPS accounting printed once per second when ``setprintframes``
  (render.c:2376-2399), with the measured UPS feeding the gravity step
  (render.c:728) as a traced scalar;
* interpolation counter ``kcounter`` — frames since the last audio
  update (render.c:1792-1809);
* frame limiter via ``setframerate`` (render.c:2361-2372), plus the
  idle sleep when nothing rendered (glava.c:541-547);
* reload: tear down and rebuild from config (glava.c:575-576).
"""

from __future__ import annotations

import threading
import time as _time
from dataclasses import dataclass

import numpy as np
import jax.numpy as jnp

from glava_tpu.config import loader as config_loader
from glava_tpu.renderer import Renderer
from glava_tpu.runtime import audio as audio_mod
from glava_tpu.runtime.sinks import FrameSink, LatestFrameSink
from glava_tpu.runtime.stdin_pipe import PipeBind, PipeReader


@dataclass
class EngineOptions:
    entry: str = "rc.glsl"
    user_dir: str | None = None
    system_dir: str | None = None
    requests: tuple[str, ...] = ()
    force_module: str | None = None
    desktop: bool = False
    wm_name: str | None = None
    audio_backend: str = "pulseaudio"
    screen: tuple[int, int] | None = None
    pipe_binds: tuple[PipeBind, ...] = ()
    test_mode: bool = False
    verbose: bool = False
    # device frames kept in flight before the host fetches the oldest:
    # depth d overlaps d device steps with one D2H transfer, trading d
    # frames of presentation latency for throughput on slow links
    # (GLAVA_TPU_INFLIGHT overrides; table in docs/STATUS.md)
    inflight: int = 1


_cache_enabled = False


def _enable_compile_cache() -> None:
    """Persist XLA compilations across runs (the reference persists
    nothing but its GLFFT wisdom; TPU compiles are seconds, so reload
    and restart latency benefit hugely)."""
    global _cache_enabled
    if _cache_enabled:
        return
    import os

    import jax

    try:
        base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
        path = os.path.join(base, "glava_tpu", "jit")
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass
    _cache_enabled = True


class Engine:
    def __init__(self, opts: EngineOptions, sink: FrameSink | None = None,
                 pipe_stream=None):
        self.opts = opts
        self.sink = sink if sink is not None else LatestFrameSink()
        self._pipe_stream = pipe_stream
        self.alive = False
        self._reload_flag = False
        self._sizereq: tuple[int, int] | None = None
        self._lock = threading.Lock()
        self.fps = 0.0
        self.ups = 0.0
        self.frames_rendered = 0
        self._build()

    def _build_step(self):
        """Jitted step matching the sink's wire format: a sink
        declaring ``wire_format == "yuv420"`` (the default Y4M/window
        sinks) gets on-device YUV420 packing — 1.5 B/px on the D2H
        wire instead of RGBA8's 4 — when the geometry is even and the
        golden test mode (which asserts on RGBA) is off."""
        w, h = self.renderer.screen
        # only pack when the frame is large enough that the wire
        # saving beats the device-side u8 reshape/concat relayout:
        # measured on the tunnel, 1080p goes 2.6 -> 5.3 fps while
        # 512x256 REGRESSES (17 -> 7.5) — small frames are
        # RTT-dominated, not bandwidth-dominated
        want_yuv = (getattr(self.sink, "wire_format", "rgba8")
                    == "yuv420"
                    and w % 2 == 0 and h % 2 == 0
                    and w * h >= (1 << 19)
                    and not self.opts.test_mode)
        self._wire = ("yuv420", w, h) if want_yuv else ("rgba8",)
        return self.renderer.jit_step(quantize=True, yuv420=want_yuv)

    def _to_host(self, frame):
        """Fetch a device frame: RGBA8 ndarray, or — on the yuv420
        wire — ONE packed buffer split into (Y, U, V) host views."""
        if self._wire[0] == "yuv420":
            _, w, h = self._wire
            buf = np.asarray(frame)
            n = h * w
            q = n // 4
            return (buf[:n].reshape(h, w),
                    buf[n:n + q].reshape(h // 2, w // 2),
                    buf[n + q:].reshape(h // 2, w // 2))
        return np.asarray(frame)

    # -- construction (rd_new equivalent) ---------------------------------

    def _build(self) -> None:
        _enable_compile_cache()
        o = self.opts
        pipe_defaults = {b.name: b.default_value() for b in o.pipe_binds}
        kwargs = {}
        if o.system_dir:
            kwargs["system_dir"] = o.system_dir
        entry = "test_rc.glsl" if o.test_mode and o.entry == "rc.glsl" else o.entry
        self.loaded = config_loader.load(
            entry=entry,
            user_dir=o.user_dir,
            cli_requests=o.requests,
            force_module=o.force_module,
            desktop=o.desktop,
            wm_name=o.wm_name,
            pipe_values=pipe_defaults,
            **kwargs,
        )
        cfg = self.loaded.cfg
        screen = o.screen
        if self._sizereq is not None:
            screen = self._sizereq
        self.renderer = Renderer(self.loaded, screen=screen)
        self.state = self.renderer.init_state()
        self._step = self._build_step()
        self._init_bg()

        self.audio = audio_mod.make_audio_data(
            bufsize=cfg.bufsize,
            sample_sz=cfg.samplesize,
            rate=cfg.sample_rate,
            channels=1 if cfg.mirror_input else 2,
            source=cfg.audio_source,
        )
        self.backend = audio_mod.lookup(o.audio_backend)
        self.backend.init(self.audio)

        # keep the existing stdin reader across reloads (a second thread
        # on the same stream would steal lines from the first)
        if getattr(self, "pipe", None) is None:
            self.pipe = None
            if o.pipe_binds and self._pipe_stream is not None:
                self.pipe = PipeReader(list(o.pipe_binds), self._pipe_stream)

    # -- live wallpaper (bg_changed recopy, render.c:1832-1837) ------------

    def _init_bg(self) -> None:
        """When a `setbgimg` wallpaper composite is active, keep its
        planes as a device array fed through the reserved ``__bg__``
        pipe argument so a wallpaper change mid-run is picked up with
        no recompile — the reference re-copies the root pixmap when
        the WM signals _XROOTPMAP_ID changed (glx_wcb.c:341-356); the
        equivalent signal here is the file's mtime/size."""
        self._bg_dev = None
        self._bg_stat = None
        if getattr(self.renderer, "bg_path", None):
            self._bg_stat = self._stat_bg()
            self._bg_dev = jnp.stack(
                [jnp.asarray(p) for p in self.renderer.load_bg_planes()]
            )

    def _stat_bg(self):
        import os

        try:
            st = os.stat(self.renderer.bg_path)
            return (st.st_mtime_ns, st.st_size, st.st_ino)
        except OSError:
            return None

    def _poll_bg(self) -> None:
        st = self._stat_bg()
        if st is None or st == self._bg_stat:
            return
        try:
            self._bg_dev = jnp.stack(
                [jnp.asarray(p) for p in self.renderer.load_bg_planes()]
            )
            self._bg_stat = st  # only on success: a torn read retries
        except Exception:
            pass  # file mid-write; keep the old composite, retry next frame

    # -- control API (glava.h parity) --------------------------------------

    def wait(self, timeout: float | None = 30.0) -> np.ndarray:
        """Block until the first frame exists (glava_wait, glava.c:243)."""
        if hasattr(self.sink, "wait"):
            return self.sink.wait(timeout)
        raise RuntimeError(
            "wait() needs a sink exposing wait() (e.g. 'latest' or "
            "'async:latest')"
        )

    def tex(self) -> np.ndarray | None:
        """Newest frame (glava_tex, glava.c:258-261)."""
        if hasattr(self.sink, "latest"):
            return self.sink.latest()
        return None

    def sizereq(self, w: int, h: int) -> None:
        """Atomic resize request (glava_sizereq, glava.c:264-268)."""
        with self._lock:
            self._sizereq = (w, h)

    def terminate(self) -> None:
        self.alive = False

    def reload(self) -> None:
        """SIGUSR1 semantics: teardown + re-instantiate (glava.c:280-286)."""
        self._reload_flag = True
        self.alive = False

    # -- frame loop -----------------------------------------------------------

    def run(self, max_frames: int | None = None, max_seconds: float | None = None):
        while True:
            self._run_once(max_frames, max_seconds)
            if self._reload_flag:
                self._reload_flag = False
                if self.opts.verbose:
                    print("reloading configuration")
                self._build()
                continue
            break
        self.sink.close()

    def _warmup(self) -> None:
        """Prime the XLA compile before the timed loop (first compile is
        seconds; it must not pollute UPS/latency measurement). Uses the
        real pipe-dict structure so the loop never retraces."""
        cfg = self.loaded.cfg
        zeros = jnp.zeros((2, cfg.bufsize), jnp.float32)
        pipe_arrs = {}
        if self.pipe:
            pipe_arrs = {
                k: jnp.asarray(v, jnp.float32)
                for k, v in self.pipe.snapshot().items()
            }
        if self._bg_dev is not None:
            pipe_arrs["__bg__"] = self._bg_dev
        state, _ = self._step(
            self.state, zeros, False, np.float32(0.0), np.float32(1.0),
            np.float32(cfg.gravity_step / cfg.nominal_ups), pipe_arrs,
        )
        # the donated init state was consumed; keep the warmed result
        self.state = state

    def _run_once(self, max_frames, max_seconds):
        cfg = self.loaded.cfg
        o = self.opts
        self.alive = True
        self._warmup()
        audio_thread = self.backend.spawn(self.audio)
        if self.pipe:
            self.pipe.start()

        nominal_ups = cfg.nominal_ups
        ur = nominal_ups  # measured updates/sec (render.c:2380-2399)
        fr = max(float(cfg.framerate) or 60.0, 1.0)
        kcounter = 0
        fcount = ucount = 0
        sec_mark = _time.monotonic()
        t0 = _time.monotonic()
        frame_period = 1.0 / cfg.framerate if cfg.framerate > 0 else 0.0
        next_frame = _time.monotonic()
        # N-deep in-flight queue of (device frame, timestamp): the
        # oldest frame's D2H transfer overlaps up to N newer device
        # steps (depth 1 = classic double buffering). env override for
        # measurement sweeps.
        import collections
        import os as _os

        try:
            depth = max(int(_os.environ.get("GLAVA_TPU_INFLIGHT",
                                            o.inflight)), 0)
        except ValueError:
            import sys as _sys

            print("glava_tpu: ignoring malformed GLAVA_TPU_INFLIGHT="
                  f"{_os.environ.get('GLAVA_TPU_INFLIGHT')!r}",
                  file=_sys.stderr)
            depth = max(o.inflight, 0)
        pending = collections.deque()

        try:
            while self.alive:
                now = _time.monotonic()
                if max_seconds is not None and now - t0 >= max_seconds:
                    break
                with self._lock:
                    sr = self._sizereq
                if sr is not None and sr != self.renderer.screen:
                    # offscreen resize (render.c:1811-1815): flush
                    # in-flight frames under the OLD wire geometry,
                    # then rebuild the raster program
                    while pending:
                        old = pending.popleft()
                        self.sink.submit(self._to_host(old[0]), old[1])
                    self.renderer = Renderer(self.loaded, screen=sr)
                    self._step = self._build_step()
                    self._init_bg()  # bg planes are screen-shaped

                if self.sink.should_close():
                    break  # presentation target gone (window closed)

                if not self.sink.should_render():
                    _time.sleep(0.05)  # obscured/fullscreen gating
                    continue

                # fail fast on capture errors, like the reference's
                # exit-on-source-error (fifo.c:45-48)
                err = getattr(audio_thread, "error", None)
                if err is not None:
                    raise RuntimeError(f"audio backend failed: {err}") from err

                snap, modified = self.audio.snapshot()
                kcounter = 0 if modified else kcounter + 1
                uratio = min(ur / max(self.fps or fr, 1.0), 1.0)
                interp_mod = min(uratio * max(kcounter, 1), 1.0)
                tnow = (now - t0) % cfg.timecycle
                gravity_g = cfg.gravity_step / max(ur, 1.0)

                pipe_vals = self.pipe.snapshot() if self.pipe else {}
                pipe_arrs = {
                    k: jnp.asarray(v, jnp.float32) for k, v in pipe_vals.items()
                }
                if self._bg_dev is not None:
                    self._poll_bg()
                    pipe_arrs["__bg__"] = self._bg_dev
                self.state, frame = self._step(
                    self.state,
                    jnp.asarray(snap),
                    bool(modified),
                    np.float32(tnow),
                    np.float32(interp_mod),
                    np.float32(gravity_g),
                    pipe_arrs,
                )
                # Up to `depth` frames stay in flight: older frames'
                # D2H transfers overlap newer frames' device compute.
                pending.append((frame, tnow))
                while len(pending) > depth:
                    old = pending.popleft()
                    self.sink.submit(self._to_host(old[0]), old[1])
                self.frames_rendered += 1
                fcount += 1
                ucount += 1 if modified else 0

                if o.test_mode:
                    ok = self.renderer.test_evaluate(np.asarray(frame))
                    self.alive = False
                    self._test_result = ok
                    break

                if max_frames is not None and self.frames_rendered >= max_frames:
                    break

                # frame limiter (render.c:2361-2372)
                if frame_period > 0:
                    next_frame += frame_period
                    delay = next_frame - _time.monotonic()
                    if delay > 0:
                        _time.sleep(delay)

                # FPS/UPS accounting (render.c:2376-2399)
                now2 = _time.monotonic()
                if now2 - sec_mark >= 1.0:
                    span = now2 - sec_mark
                    self.fps = fcount / span
                    self.ups = ucount / span
                    # feed the measured rate into the gravity step like the
                    # reference (render.c:728); guard against stalls
                    # (compiles, suspensions) nuking the decay rate
                    ur = max(self.ups, nominal_ups / 8.0)
                    if cfg.print_frames:
                        print(f"FPS: {self.fps:.1f}, UPS: {self.ups:.1f}")
                    fcount = ucount = 0
                    sec_mark = now2
        finally:
            while pending:
                old = pending.popleft()
                self.sink.submit(self._to_host(old[0]), old[1])
            self.audio.terminate = True
            audio_thread.join(timeout=2.0)
            self.audio.terminate = False

    # -- golden test mode (render.c:2419-2453, glava.c:548-562) ---------------

    def run_tests(self) -> bool:
        self._test_result = False
        self.run(max_frames=1)
        return self._test_result
