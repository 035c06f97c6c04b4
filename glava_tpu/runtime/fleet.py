"""FleetEngine: serve many visualizer streams from one device program.

The deployment mode the reference cannot express (one process = one
window): N independent audio sources batch onto a single chip — one
fused kernel call and one raster program per frame for the whole fleet
— and each stream's frames flow to its own sink. Per-stream parameters
(colors via pipe values, gravity/fft knobs) ride (S,)-leading arrays.

Streams sharing a FleetEngine share a module + static knob set (one
compiled program); heterogeneous fleets run one FleetEngine per module
group. Dynamics (gravity feedback from measured per-stream UPS,
keyframe interpolation via per-stream kcounters) mirror the
single-stream engine loop, and the fused spectrum kernel keeps
per-stream ring-slot counters, so streams on independent audio clocks
behave exactly like N separate engines.
"""

from __future__ import annotations

import time as _time
from dataclasses import dataclass, field
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp

from glava_tpu.config.loader import LoadedConfig
from glava_tpu.parallel.batch import BatchedRenderer
from glava_tpu.runtime import audio as audio_mod
from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.runtime.sinks import FrameSink, LatestFrameSink, make_sink


@dataclass
class StreamSpec:
    """One fleet member: an audio source and a frame destination."""

    name: str
    audio_backend: str = "synth"
    source: str | None = None
    sink: FrameSink | str = "latest"
    pipe: dict[str, Any] = field(default_factory=dict)  # per-stream uniforms
    #: optional per-stream module/knob config — streams whose `loaded`
    #: differs from the engine's run different modules in the same
    #: jitted step (MixedBatchedRenderer); DSP-shaping config must match
    loaded: LoadedConfig | None = None


class FleetDynamics:
    """Per-stream frame-clock dynamics, the vectorized mirror of the
    single-stream engine loop (engine.py run(); render.c:728,
    1792-1809, 2380-2399): per-stream kcounter-driven interpolation and
    measured-UPS gravity feedback with the nominal/8 stall guard."""

    def __init__(self, n_streams: int, nominal_ups: float, framerate: float):
        self.S = n_streams
        self.nominal_ups = float(nominal_ups)
        self.fr = max(float(framerate) or 60.0, 1.0)
        self.ur = np.full((n_streams,), self.nominal_ups, np.float64)
        self.kcounter = np.zeros((n_streams,), np.int64)
        self.ucount = np.zeros((n_streams,), np.int64)
        self.ups = np.zeros((n_streams,), np.float64)

    def frame(self, mods: np.ndarray, fps: float):
        """Advance one frame: returns the (S,) f32 interpolation mod
        (gravity decay comes from the separate :meth:`gravity`)."""
        self.kcounter = np.where(mods, 0, self.kcounter + 1)
        uratio = np.minimum(self.ur / max(fps or self.fr, 1.0), 1.0)
        interp = np.minimum(
            uratio * np.maximum(self.kcounter, 1), 1.0
        ).astype(np.float32)
        self.ucount += mods
        return interp

    def gravity(self, gravity_step: float) -> np.ndarray:
        return (gravity_step / np.maximum(self.ur, 1.0)).astype(np.float32)

    def tick(self, span: float) -> np.ndarray:
        """Per-second accounting: returns per-stream UPS and feeds the
        measured rate into the gravity step (stall-guarded)."""
        self.ups = self.ucount / max(span, 1e-9)
        self.ur = np.maximum(self.ups, self.nominal_ups / 8.0)
        self.ucount = np.zeros((self.S,), np.int64)
        return self.ups


class FleetEngine:
    """Multi-stream serving engine; pass ``mesh`` (jax.sharding.Mesh
    with 'streams'/'rows' axes, see parallel/mesh.py) to shard the
    fleet across chips — streams ride data parallelism, frame rows ride
    spatial parallelism, XLA inserts the ICI collectives."""

    def __init__(self, loaded: LoadedConfig, streams: list[StreamSpec],
                 screen: tuple[int, int] | None = None, mesh=None):
        _enable_compile_cache()
        if not streams:
            raise ValueError("fleet needs at least one stream")
        self.loaded = loaded
        self.streams = streams
        self.mesh = mesh
        # heterogeneous fleets: group streams by module-config variant
        variants: list[LoadedConfig] = [loaded]
        assign: list[int] = []
        for s in streams:
            lc = s.loaded if s.loaded is not None else loaded
            try:
                k = next(i for i, v in enumerate(variants) if v is lc)
            except StopIteration:
                variants.append(lc)
                k = len(variants) - 1
            assign.append(k)
        if len(variants) == 1:
            self.br = BatchedRenderer(
                loaded, n_streams=len(streams), screen=screen
            )
        else:
            from glava_tpu.parallel.batch import MixedBatchedRenderer

            self.br = MixedBatchedRenderer(variants, assign, screen=screen)
        cfg = loaded.cfg
        self.sinks: list[FrameSink] = [
            s.sink if isinstance(s.sink, FrameSink) else make_sink(s.sink)
            for s in streams
        ]
        self.audio: list[audio_mod.AudioData] = []
        self.backends = []
        for s in streams:
            ad = audio_mod.make_audio_data(
                bufsize=cfg.bufsize, sample_sz=cfg.samplesize,
                rate=cfg.sample_rate,
                channels=1 if cfg.mirror_input else 2,
                source=s.source if s.source is not None else cfg.audio_source,
            )
            backend = audio_mod.lookup(s.audio_backend)
            backend.init(ad)
            self.audio.append(ad)
            self.backends.append(backend)
        # stacked per-stream pipe values (static structure, live-updatable)
        names = sorted({k for s in streams for k in s.pipe})
        self._pipe_names = names
        self._pipe_host = {
            n: np.stack([
                np.asarray(s.pipe.get(n, self._default_pipe(n)), np.float32)
                for s in streams
            ])
            for n in names
        }
        self.state = self.br.init_state()
        self._step = self._make_step()
        self.alive = False
        self.frames_rendered = 0
        self.fps = 0.0
        self.ups = np.zeros((len(streams),), np.float64)  # per-stream

    def _default_pipe(self, name):
        for s in self.streams:
            if name in s.pipe:
                v = np.asarray(s.pipe[name], np.float32)
                return np.zeros_like(v)
        return 0.0

    def _make_step(self):
        br = self.br

        def step(state, audio, modified, t, interp, g, pipe):
            # quantize=True: channel planes quantize to uint8 BEFORE
            # the one per-frame interleave (4x smaller stack + wire)
            st, frames = br.step(state, audio, modified, t, interp, g, pipe,
                                 quantize=True)
            if self.mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                frames = jax.lax.with_sharding_constraint(
                    frames, NamedSharding(self.mesh, P("streams", "rows"))
                )
            return st, frames

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            s = NamedSharding(self.mesh, P("streams"))
            r = NamedSharding(self.mesh, P())
            self.state = self.br.shard_state(self.state, self.mesh)
            return jax.jit(
                step,
                in_shardings=(s, s, s, s, s, s, r),
                out_shardings=(s, NamedSharding(self.mesh, P("streams", "rows"))),
                donate_argnums=(0,),
            )
        return jax.jit(step, donate_argnums=(0,))

    def set_pipe(self, stream: int, name: str, value) -> None:
        """Live per-stream uniform update (no recompilation)."""
        self._pipe_host[name][stream] = np.asarray(value, np.float32)

    def run(self, max_frames: int | None = None,
            max_seconds: float | None = None) -> None:
        cfg = self.loaded.cfg
        S = len(self.streams)
        threads = [b.spawn(a) for b, a in zip(self.backends, self.audio)]
        self.alive = True
        dyn = FleetDynamics(S, cfg.nominal_ups, cfg.framerate)
        t0 = _time.monotonic()
        fcount, mark = 0, t0
        pending = None
        # warmup
        zeros = jnp.zeros((S, 2, cfg.bufsize), jnp.float32)
        pipe = {k: jnp.asarray(v) for k, v in self._pipe_host.items()}
        self.state, _ = self._step(
            self.state, zeros, jnp.zeros((S,), bool),
            jnp.zeros((S,), jnp.float32), jnp.ones((S,), jnp.float32),
            jnp.full((S,), cfg.gravity_step / cfg.nominal_ups, jnp.float32),
            pipe,
        )
        try:
            while self.alive:
                now = _time.monotonic()
                if max_seconds is not None and now - t0 >= max_seconds:
                    break
                snaps = np.empty((S, 2, cfg.bufsize), np.float32)
                mods = np.empty((S,), bool)
                for i, ad in enumerate(self.audio):
                    snaps[i], mods[i] = ad.snapshot()
                interp = dyn.frame(mods, self.fps)
                gravity_g = dyn.gravity(cfg.gravity_step)
                tnow = (now - t0) % cfg.timecycle
                pipe = {k: jnp.asarray(v) for k, v in self._pipe_host.items()}
                self.state, frames = self._step(
                    self.state, jnp.asarray(snaps), jnp.asarray(mods),
                    jnp.full((S,), np.float32(tnow)),
                    jnp.asarray(interp),
                    jnp.asarray(gravity_g),
                    pipe,
                )
                if pending is not None:
                    self._distribute(pending[0], pending[1])
                pending = (frames, tnow)
                self.frames_rendered += 1
                fcount += 1
                if now - mark >= 1.0:
                    span = now - mark
                    self.fps = fcount / span
                    self.ups = dyn.tick(span)
                    if cfg.print_frames:
                        print(f"FPS: {self.fps:.1f}, UPS: "
                              f"{float(np.mean(self.ups)):.1f} (fleet mean)")
                    fcount, mark = 0, now
                if max_frames is not None and self.frames_rendered >= max_frames:
                    break
        finally:
            if pending is not None:
                self._distribute(pending[0], pending[1])
            for ad in self.audio:
                ad.terminate = True
            for t in threads:
                t.join(timeout=2.0)
            for s in self.sinks:
                s.close()

    def _distribute(self, frames, tnow: float) -> None:
        host = np.asarray(frames)  # (S, H, W, 4) uint8, one transfer
        for i, sink in enumerate(self.sinks):
            sink.submit(host[i], tnow)

    def tex(self, stream: int) -> np.ndarray | None:
        s = self.sinks[stream]
        return s.latest() if hasattr(s, "latest") else None

    def terminate(self) -> None:
        self.alive = False
