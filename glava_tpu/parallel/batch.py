"""BatchedRenderer: many independent audio streams on one program.

BASELINE.json config #4: 64 concurrent streams per chip with per-stream
parameters. The single-stream step (renderer.py) is written batched-
shape-polymorphic where cheap and vmapped where not; per-stream DSP
scalars (fft_scale/fft_cutoff/gravity) and per-stream pipe uniforms
arrive as (S,)-leading arrays. Sharding: streams ride the 'streams'
mesh axis, frame rows optionally ride 'rows' (see parallel/mesh.py).
"""

from __future__ import annotations

from dataclasses import dataclass
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from glava_tpu.config.loader import LoadedConfig
from glava_tpu.renderer import Renderer, RenderState


def _composite_bg(rend: Renderer, planes):
    """xroot/none-opacity background composite over channel planes,
    matching the single-stream Renderer.step_planes exactly
    (render.c:1468-1469, 1700, 2028): blend over the `setbgimg`
    wallpaper when supplied, else the `setbg` clear color. No-op for
    premultiplied (native) opacity."""
    if rend.cfg.premultiply_alpha:
        return planes
    a = planes[3]
    return tuple(
        c * a + b * (1.0 - a) for c, b in zip(planes, rend._bg_planes)
    )


@dataclass
class BatchedRenderer:
    loaded: LoadedConfig
    n_streams: int
    screen: tuple[int, int] | None = None

    def __post_init__(self):
        self.renderer = Renderer(self.loaded, screen=self.screen)
        self.cfg = self.renderer.cfg

    def init_state(self) -> RenderState:
        return self.renderer.init_state(batch=(self.n_streams,))

    def step(
        self,
        state: RenderState,
        audio: jax.Array,            # (S, 2, bufsize)
        modified: jax.Array,         # (S,) bool
        time: jax.Array,             # (S,) seconds
        interp_mod: jax.Array,       # (S,)
        gravity_g: jax.Array,        # (S,)
        pipe: dict[str, jax.Array] | None = None,  # each (S, ...) leading
        quantize: bool = False,
    ) -> tuple[RenderState, jax.Array]:
        """One frame for every stream: (S, H, W, 4) output — float32,
        or uint8 when ``quantize`` (the serving wire format; quantizing
        per channel plane before the interleave keeps the one RGBA
        materialization 4x smaller).

        The pipeline runs natively batched (one fused kernel call for
        the whole fleet); per-stream update gating selects between
        advanced and carried state. Only the rasterizer is vmapped.
        The fused path keeps a per-row ring-slot counter, so streams
        updating on independent clocks (staggered `modified` masks) get
        exact per-stream averaging ages.
        """
        rend = self.renderer
        cfg = self.cfg
        m3 = modified[:, None, None]
        key_start = jnp.where(m3, state.key_end, state.key_start)
        key_end = jnp.where(m3, audio, state.key_end)

        if cfg.interpolate and not cfg.accel_fft:
            im3 = jnp.minimum(interp_mod, 1.0)[:, None, None]
            feed = key_start + (key_end - key_start) * im3
        else:
            feed = key_end

        adv = rend.pipeline.advance(
            state.chains, feed[:, 0, :], feed[:, 1, :], gravity_g=gravity_g
        )
        chains = rend.pipeline.select_updated(adv, state.chains, modified)
        textures = rend.pipeline.textures_from(
            chains, feed[:, 0, :], feed[:, 1, :]
        )

        from glava_tpu.render.base import PassInputs, interleave, interleave_u8

        h, w = rend.screen[1], rend.screen[0]
        pack = interleave_u8 if quantize else interleave

        def raster(tex, ti, pi):
            if pi:
                vals = {}
                for k, v in pi.items():
                    arr = jnp.asarray(v)
                    vals[k] = (
                        tuple(arr[i] for i in range(arr.shape[0]))
                        if arr.ndim else arr
                    )
                rend.module_env.pipe_values.clear()
                rend.module_env.pipe_values.update(vals)
            planes = rend.module.render(
                PassInputs(prev=None, textures=tex, time=ti)
            )
            return pack(_composite_bg(rend, planes), h, w)

        frames = jax.vmap(raster)(textures, time, pipe if pipe else {})
        return RenderState(chains, key_start, key_end), frames

    # -- update-only fast path (spectrum textures, no raster) -------------

    def update_textures(self, chains, audio, gravity_g):
        """(S, 2, bufsize) -> per-uniform (S, sz) textures."""
        return self.renderer.pipeline.update(
            chains, audio[..., 0, :], audio[..., 1, :], gravity_g=gravity_g
        )

    # -- sharded program ---------------------------------------------------

    def sharded_step(self, mesh: Mesh):
        """jit the batched step with streams/rows shardings on `mesh`.

        Streams shard over the stream axes (DP over streams — on a
        multi-host mesh that is ('hosts', 'streams'), with the hosts
        axis carrying zero per-step collectives since streams are
        independent); the output frame is additionally constrained to
        split its row axis over 'rows' (spatial parallelism) — XLA
        all-gathers the small spectrum textures and partitions the
        raster math.
        """
        from glava_tpu.parallel.mesh import frame_sharding, stream_sharding

        s = stream_sharding(mesh)
        fr = frame_sharding(mesh)
        r = NamedSharding(mesh, P())

        def step(state, audio, modified, time, interp_mod, gravity_g, pipe):
            st, frame = self.step(
                state, audio, modified, time, interp_mod, gravity_g, pipe
            )
            frame = jax.lax.with_sharding_constraint(frame, fr)
            return st, frame

        return jax.jit(
            step,
            in_shardings=(s, s, s, s, s, s, r),
            out_shardings=(s, fr),
            donate_argnums=(0,),
        )

    def shard_state(self, state: RenderState, mesh: Mesh) -> RenderState:
        from glava_tpu.parallel.mesh import stream_sharding

        s = stream_sharding(mesh)
        return jax.tree.map(lambda x: jax.device_put(x, s), state)


class MixedBatchedRenderer:
    """Heterogeneous fleet: per-stream module variants in ONE program.

    BASELINE config #4's "per-stream module configs" fully realized:
    streams may run *different* modules (bars + radial + wave, each
    with its own knob set) inside a single jitted step. Spectrum
    chains are deduplicated by (source, transform-chain) across the
    variants and run once through the shared (fused) pipeline; the
    raster stage groups streams by their statically-assigned variant,
    vmaps each variant's pass chain over its own sub-batch, and
    reassembles the (S, H, W, 4) output. Static grouping beats a
    vmapped ``lax.switch`` here: under vmap a switch executes every
    branch for every stream, an M-fold raster overhead, while the
    assignment never changes after construction.

    All variants must agree on the DSP-shaping config (bufsize,
    samplesize, rate, averaging, smoothing) — they share one spectrum
    state; raster knobs/colors/modules are free per variant.
    """

    _COMPAT_FIELDS = (
        "bufsize", "samplesize", "sample_rate", "bufscale", "avg_frames",
        "avg_window", "accel_fft", "smooth_factor", "smooth_pass",
        "interpolate", "mirror_input", "timecycle",
    )

    def __init__(self, loadeds: list[LoadedConfig], assign: list[int],
                 screen: tuple[int, int] | None = None):
        if not loadeds:
            raise ValueError("need at least one module variant")
        if any(not 0 <= a < len(loadeds) for a in assign):
            raise ValueError("stream assignment out of range")
        base = loadeds[0].cfg
        for lc in loadeds[1:]:
            for f in self._COMPAT_FIELDS:
                if getattr(lc.cfg, f) != getattr(base, f):
                    raise ValueError(
                        f"module variants disagree on '{f}' — spectrum "
                        "state is shared, so DSP-shaping config must match"
                    )
        self.loadeds = loadeds
        self.assign = list(assign)
        self.n_streams = len(assign)
        self.renderers = [Renderer(lc, screen=screen) for lc in loadeds]
        self.cfg = base
        self.screen = self.renderers[0].screen
        for r in self.renderers[1:]:
            if r.screen != self.screen:
                raise ValueError("variants must share the frame geometry")

        # dedupe (source, chain) across variants into one union pipeline
        from glava_tpu.pipeline import AudioPipeline, UniformSpec

        canon: dict[tuple, str] = {}
        self._variant_tex: list[dict[str, str]] = []
        for r in self.renderers:
            vm = {}
            for u in r.uniforms:
                key = (u.source, tuple(u.transforms))
                cname = canon.setdefault(key, f"__u{len(canon)}")
                vm[u.name] = cname
            self._variant_tex.append(vm)
        union = [UniformSpec(cname, src, ch)
                 for (src, ch), cname in canon.items()]
        self.pipeline = AudioPipeline(base, union)
        # static stream grouping per variant
        self._groups = [
            tuple(s for s, a in enumerate(self.assign) if a == k)
            for k in range(len(loadeds))
        ]

    def init_state(self) -> RenderState:
        S = self.n_streams
        return RenderState(
            chains=self.pipeline.init_state(batch=(S,)),
            key_start=jnp.zeros((S, 2, self.cfg.bufsize), jnp.float32),
            key_end=jnp.zeros((S, 2, self.cfg.bufsize), jnp.float32),
        )

    def step(self, state, audio, modified, time, interp_mod, gravity_g,
             pipe=None, quantize=False):
        """(S, H, W, 4) heterogeneous frames in one traced program
        (float32, or uint8 when ``quantize`` — see BatchedRenderer)."""
        cfg = self.cfg
        m3 = modified[:, None, None]
        key_start = jnp.where(m3, state.key_end, state.key_start)
        key_end = jnp.where(m3, audio, state.key_end)
        if cfg.interpolate and not cfg.accel_fft:
            im3 = jnp.minimum(interp_mod, 1.0)[:, None, None]
            feed = key_start + (key_end - key_start) * im3
        else:
            feed = key_end
        adv = self.pipeline.advance(
            state.chains, feed[:, 0, :], feed[:, 1, :], gravity_g=gravity_g
        )
        chains = self.pipeline.select_updated(adv, state.chains, modified)
        textures = self.pipeline.textures_from(
            chains, feed[:, 0, :], feed[:, 1, :]
        )

        from glava_tpu.render.base import PassInputs, interleave, interleave_u8

        pack = interleave_u8 if quantize else interleave
        w, h = self.screen
        parts = []
        order = []
        for k, idxs in enumerate(self._groups):
            if not idxs:
                continue
            rend = self.renderers[k]
            vm = self._variant_tex[k]
            rows = jnp.asarray(idxs, jnp.int32)
            sub_tex = {un: textures[cn][rows] for un, cn in vm.items()}
            sub_time = time[rows]
            sub_pipe = (
                {n: jnp.asarray(v)[rows] for n, v in pipe.items()}
                if pipe else {}
            )

            def raster(tex, ti, pi, rend=rend):
                if pi:
                    vals = {}
                    for kk, v in pi.items():
                        arr = jnp.asarray(v)
                        vals[kk] = (
                            tuple(arr[i] for i in range(arr.shape[0]))
                            if arr.ndim else arr
                        )
                    rend.module_env.pipe_values.clear()
                    rend.module_env.pipe_values.update(vals)
                planes = rend.module.render(
                    PassInputs(prev=None, textures=tex, time=ti)
                )
                return pack(_composite_bg(rend, planes), h, w)

            parts.append(jax.vmap(raster)(sub_tex, sub_time, sub_pipe))
            order.extend(idxs)
        inv = np.argsort(np.asarray(order))
        frames = jnp.concatenate(parts, axis=0)[jnp.asarray(inv)]
        return RenderState(chains, key_start, key_end), frames

    def shard_state(self, state: RenderState, mesh: Mesh) -> RenderState:
        from glava_tpu.parallel.mesh import stream_sharding

        s = stream_sharding(mesh)
        return jax.tree.map(lambda x: jax.device_put(x, s), state)


def example_batch(br: BatchedRenderer, rng_seed: int = 0):
    """Synthetic per-stream inputs for compile checks and benches."""
    S = br.n_streams
    cfg = br.cfg
    rng = np.random.default_rng(rng_seed)
    freqs = rng.uniform(100.0, 8000.0, size=S)
    t = np.arange(cfg.bufsize) / cfg.sample_rate
    audio = np.stack(
        [
            np.stack(
                [
                    0.4 * np.sin(2 * np.pi * f * t),
                    0.4 * np.sin(2 * np.pi * (f * 1.5) * t),
                ]
            )
            for f in freqs
        ]
    ).astype(np.float32)
    return dict(
        audio=jnp.asarray(audio),
        modified=jnp.ones((S,), jnp.bool_),
        time=jnp.zeros((S,), jnp.float32),
        interp_mod=jnp.ones((S,), jnp.float32),
        gravity_g=jnp.full((S,), cfg.gravity_step / cfg.nominal_ups, jnp.float32),
    )
