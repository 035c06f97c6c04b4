"""AudioPipeline: PCM windows -> per-uniform spectrum textures.

This is the device-side "update" half of the reference's frame loop
(the ``handle_audio`` closure, glava/render.c:2113-2309): for every
audio uniform a module binds, apply its declared transform chain and
produce the 1-D texture the rasterizer samples. Stateful dynamics
(gravity peak-hold, N-frame averaging) are carried explicitly so the
whole update jits and batches.

Chain semantics (render.c:849-856, 1256-1284, 2128-2160):

* ``window``   — registered no-op (windowing lives inside ``fft``).
* ``fft``      — window + packed FFT + log-mag + boost, then *implied*
                 gravity and average, in that order.
* ``gravity``/``avg`` — deprecated no-op names (implied by fft).
* ``smooth``   — log-scale neighborhood average (deprecated CPU path).
* ``wrange``   — [-1,1] -> [0,1].

After the chain, the default configuration applies the smooth *pass*
(render.c:2276-2303): a log-frequency resample of the texture onto
itself, baked here as a precomputed matrix operator.

Two execution paths produce identical results (tests assert ~1e-5):

* **unfused** (any backend, the default): jnp ops, XLA-fused. On TPU
  this is also the FASTER path — honest measurement (scalar-probe
  completion + slope timing; jax.block_until_ready is unreliable on
  the axon runtime) shows XLA's fusion beats the hand-written kernel
  ~2x at the shipped sizes, because XLA schedules the FFT matmuls over
  the full batch while a Pallas grid serializes VMEM-sized tiles.
* **fused** (opt-in: GLAVA_TPU_FUSED=1): the Pallas kernel in
  ops/pallas/fused.py keeps FFT + magnitude + gravity + rolling
  average in VMEM per batch tile. Kept as the measured-and-pinned
  alternative (and the larger-bufsize escape hatch, where VMEM
  residency could win). State layout differs (complex planes + ring
  slot), so each path has its own carry type.

The API is split as ``advance`` (state transition) + ``textures_from``
(state -> textures): batched engines gate per-stream updates by
selecting between advanced and previous state before materializing
textures, which is how the reference's "only transform on new audio"
rule (render.c:2122) generalizes to a vector of streams.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from glava_tpu.config.state import RenderConfig
from glava_tpu.ops import smoothing, transforms, windows


@dataclass(frozen=True)
class UniformSpec:
    """One audio uniform binding and its transform chain.

    Mirrors ``#request uniform "audio_l" name`` + ``#request transform
    name "fft"`` declarations in module pass sources
    (e.g. shaders/glava/bars/1.frag:12-24).
    """

    name: str                      # uniform name in the module ("audio_l")
    source: str                    # "audio_l" | "audio_r"
    transforms: tuple[str, ...]    # declared chain, reference names


class FusedChainState(NamedTuple):
    """Carry for the Pallas fused path (complex-plane layout).

    One stacked state for ALL fft uniforms, stored under the
    ``_FUSED_KEY`` entry of the chain dict in the kernel's own flat
    layout ``(B, ...) = (prod(batch) * U, ...)`` with row order
    ``s * U + u`` — the kernel consumes/aliases these buffers without
    any reshape, which keeps scan/donation aliasing intact. ``avg``
    caches the kernel's averaged output — carried streams reuse it
    exactly like the reference reuses the last average texture
    (render.c:2268-2272).
    """

    gravity: jax.Array   # (B, 2, m)
    history: jax.Array   # (B, F, 2, m) rolling ring
    avg: jax.Array       # (B, 2, m) last averaged spectrum
    count: jax.Array     # (B,) int32 per-row update counters
    #                      (ring slot = count % F; per-row so streams on
    #                      independent clocks keep exact averaging ages,
    #                      matching the reference's per-renderer history)


class RingChainState(NamedTuple):
    """Carry for the default (XLA) path: a rolling ring history.

    ALL fft uniforms ride one stacked state with a trailing uniform
    axis before the chain dims ((*batch, U, ...)) — one XLA subgraph.
    The history is a RING with per-stream update counters (exactly the
    reference's per-renderer semantics, render.c:738-771): an update
    overwrites one slot instead of shifting F planes, which measures
    ~25% faster at the shipped sizes, and the averaging weights are
    applied by frame AGE at texture time (w[(slot - f) mod F]; the
    reference binds its averaging FBOs newest-first,
    render.c:2252-2256).
    """

    gravity: jax.Array   # (*batch, U, sz)
    history: jax.Array   # (*batch, U, F, sz) ring
    count: jax.Array     # (*batch,) int32 per-stream update counters


_FUSED_KEY = "__fused__"
# the default XLA path's state key (see RingChainState)
_XLA_KEY = "__xla__"


_KNOWN_TRANSFORMS = {"window", "fft", "wrange", "avg", "gravity", "smooth"}
_STANDARD_CHAIN = ("window", "fft", "gravity", "avg")


def _has_fft(chain: tuple[str, ...]) -> bool:
    return "fft" in chain


def _fused_supported(cfg: RenderConfig, uniforms) -> bool:
    sz = cfg.scaled_bufsize
    m = sz // 2
    if not (cfg.accel_fft and m % 128 == 0 and m >= 256):
        return False
    fft_us = [u for u in uniforms if _has_fft(u.transforms)]
    if not fft_us:
        return False
    for u in fft_us:
        if tuple(u.transforms) != _STANDARD_CHAIN:
            return False
    return True


class AudioPipeline:
    """Builds the jittable update step for a set of uniform chains."""

    def __init__(
        self,
        cfg: RenderConfig,
        uniforms: list[UniformSpec],
        use_fused: bool | None = None,
    ):
        for u in uniforms:
            unknown = set(u.transforms) - _KNOWN_TRANSFORMS
            if unknown:
                raise ValueError(
                    f"transform function does not exist: {sorted(unknown)!r}"
                )
        self.cfg = cfg
        self.uniforms = list(uniforms)
        self.sz = cfg.scaled_bufsize
        self.avg_weights = jnp.asarray(
            windows.avg_weights(cfg.avg_frames, cfg.avg_window, cfg.accel_fft)
        )
        self.smooth_params = smoothing.SmoothParams(factor=cfg.smooth_factor)
        self.presmooth = (
            smoothing.presmooth_op(self.sz, self.smooth_params)
            if cfg.smooth_pass
            else None
        )
        if use_fused is None:
            # Default: consult the persisted path wisdom (measured
            # XLA-vs-Pallas head-to-head on this device kind + shape,
            # ops/autotune.selected_path — learned by
            # `glava-tpu-bench --tune`, the GLFFT-wisdom role of
            # governing the pipeline that actually runs). Without a
            # wisdom entry the measured default applies: the XLA chain
            # (round-2 honest measurement, 81 vs 159 us per 64-stream
            # update on v5e — the kernel's tile-serialized grid loses
            # to XLA's full-batch matmul scheduling). GLAVA_TPU_FUSED=1
            # / =0 force-overrides either way.
            import os

            supported = (
                jax.default_backend() == "tpu"
                and _fused_supported(cfg, self.uniforms)
            )
            env = os.environ.get("GLAVA_TPU_FUSED", "")
            if env == "1":
                use_fused = supported
            elif env == "0" or not supported:
                use_fused = False
            else:
                from glava_tpu.ops import autotune

                use_fused = (
                    autotune.selected_path(self.sz, cfg.avg_frames)["path"]
                    == "pallas"
                )
        if use_fused and not _fused_supported(cfg, self.uniforms):
            raise ValueError("fused path unsupported for this configuration")
        self.use_fused = use_fused
        self._fft_uniforms = [u for u in self.uniforms if _has_fft(u.transforms)]
        if use_fused:
            import os

            from glava_tpu.ops.pallas.fused import build_fused_update_inc
            from glava_tpu.ops.autotune import best_batch_tile

            tile, megacore = best_batch_tile(self.sz, cfg.avg_frames)
            self._fused = build_fused_update_inc(
                self.sz,
                cfg.avg_frames,
                tuple(float(w) for w in np.asarray(self.avg_weights)),
                batch_tile=tile,
                megacore=megacore,
                fast_math=os.environ.get("GLAVA_TPU_FAST_MATH", "") == "1",
            )
        else:
            self._fused = None

    # -- state ----------------------------------------------------------

    def init_state(self, batch: tuple[int, ...] = ()) -> dict[str, Any]:
        state: dict[str, Any] = {}
        m = self.sz // 2
        F = self.cfg.avg_frames
        if self.use_fused:
            U = len(self._fft_uniforms)
            B = U
            for d in batch:
                B *= d
            state[_FUSED_KEY] = FusedChainState(
                gravity=jnp.zeros((B, 2, m), jnp.float32),
                history=jnp.zeros((B, F, 2, m), jnp.float32),
                avg=jnp.zeros((B, 2, m), jnp.float32),
                count=jnp.zeros((B,), jnp.int32),
            )
            return state
        if self._fft_uniforms:
            U = len(self._fft_uniforms)
            state[_XLA_KEY] = RingChainState(
                gravity=jnp.zeros(batch + (U, self.sz), jnp.float32),
                history=jnp.zeros(batch + (U, F, self.sz), jnp.float32),
                count=jnp.zeros(batch, jnp.int32),
            )
        return state

    # -- parameter defaults ------------------------------------------------

    def _params(self, fft_scale, fft_cutoff, gravity_g):
        cfg = self.cfg
        return (
            cfg.fft_scale if fft_scale is None else fft_scale,
            cfg.fft_cutoff if fft_cutoff is None else fft_cutoff,
            cfg.gravity_step / cfg.nominal_ups if gravity_g is None else gravity_g,
        )

    # -- state transition --------------------------------------------------

    def advance(
        self,
        state: dict[str, Any],
        audio_l: jax.Array,
        audio_r: jax.Array,
        *,
        fft_scale=None,
        fft_cutoff=None,
        gravity_g=None,
    ) -> dict[str, Any]:
        """Apply one audio update to every stateful chain."""
        cfg = self.cfg
        fft_scale, fft_cutoff, gravity_g = self._params(
            fft_scale, fft_cutoff, gravity_g
        )
        audio_l = transforms.decimate(audio_l, cfg.bufscale)
        audio_r = transforms.decimate(audio_r, cfg.bufscale)
        sources = {"audio_l": audio_l, "audio_r": audio_r}

        if self.use_fused:
            return self._advance_fused(
                state, sources, fft_scale, fft_cutoff, gravity_g
            )

        if not self._fft_uniforms:
            return dict(state)
        # one stacked update for every fft uniform: (*batch, U, n) pcm
        # against the (*batch, U, ...) chain state — a single XLA
        # subgraph whose FFT matmuls span all uniforms at once
        pcm = jnp.stack(
            [sources[u.source] for u in self._fft_uniforms], axis=-2
        )

        def exp1(p):
            # fft params: packed_spectrum appends its own bins axis, so
            # per-stream (S,) -> (S, 1) covering the uniform axis
            arr = jnp.asarray(p)
            return arr[..., None] if arr.ndim else arr

        def exp2(p):
            # gravity: (S,) -> (S, 1, 1) against (S, U, sz)
            arr = jnp.asarray(p)
            return arr[..., None, None] if arr.ndim else arr

        st: RingChainState = state[_XLA_KEY]
        F = self.cfg.avg_frames
        spec = transforms.fft_chain(pcm, exp1(fft_scale), exp1(fft_cutoff))
        if cfg.accel_fft:
            # GL_R16 per-stage clamping (render.c:512-523)
            spec = jnp.clip(spec, 0.0, 1.0)
            grav = jnp.clip(
                jnp.maximum(st.gravity, spec) - exp2(gravity_g), 0.0, 1.0
            )
        else:
            grav, _ = transforms.gravity_apply(
                st.gravity, spec, exp2(gravity_g)
            )
        slot = jnp.mod(st.count, F)
        if st.count.ndim == 0:
            # single stream: one dynamic slice write (in-place)
            hist = jax.lax.dynamic_update_slice_in_dim(
                st.history, grav[..., None, :], slot, axis=-2
            )
        else:
            # per-stream slots: masked per-plane select (an XLA scatter
            # with per-row indices measures slower on TPU)
            f_iota = jnp.arange(F).reshape(
                (1,) * (st.count.ndim + 1) + (F, 1)
            )
            slot_b = slot.reshape(slot.shape + (1, 1, 1))
            hist = jnp.where(slot_b == f_iota, grav[..., None, :], st.history)
        new_state = dict(state)
        new_state[_XLA_KEY] = RingChainState(
            # store mod F: only slot/age math ever consumes count, and
            # an unbounded int32 would wrap discontinuously after ~2^31
            # updates (misweighting one ring period)
            gravity=grav, history=hist, count=jnp.mod(st.count + 1, F)
        )
        return new_state

    def _advance_fused(self, state, sources, fft_scale, fft_cutoff, gravity_g):
        us = self._fft_uniforms
        frames = self.cfg.avg_frames
        st: FusedChainState = state[_FUSED_KEY]
        # Stack every fft uniform into the flat kernel batch, keeping
        # any stream batch leading: (*batch, U, n) -> (prod*U, n).
        pcm = jnp.stack([sources[u.source] for u in us], axis=-2)
        lead = pcm.shape[:-1]          # (*batch, U)
        B = int(np.prod(lead))
        pcm = pcm.reshape(B, self.sz)
        slot = jnp.mod(st.count, frames)

        def flat_param(p):
            # scalar stays scalar; per-stream (batch...) params tile per
            # uniform into the flat kernel batch
            arr = jnp.asarray(p, jnp.float32)
            if arr.ndim == 0:
                return arr
            return jnp.broadcast_to(
                arr[..., None], arr.shape + (len(us),)
            ).reshape(B)

        grav, hist, ssum = self._fused(
            pcm, st.gravity, st.history, st.avg, slot,
            flat_param(fft_scale), flat_param(fft_cutoff), flat_param(gravity_g),
        )
        new_state = dict(state)
        new_state[_FUSED_KEY] = FusedChainState(
            # mod frames: see the RingChainState counter note above
            gravity=grav, history=hist, avg=ssum,
            count=jnp.mod(st.count + 1, frames),
        )
        return new_state

    # -- textures ---------------------------------------------------------

    def textures_from(
        self,
        state: dict[str, Any],
        audio_l: jax.Array,
        audio_r: jax.Array,
    ) -> dict[str, jax.Array]:
        """Materialize every uniform's texture from (possibly carried)
        state plus the current ring for stateless chains.

        Texture-upload semantics: all 1-D audio textures are GL_R16
        unsigned normalized (render.c:512-523), so values clamp to
        [0, 1] regardless of path.
        """
        cfg = self.cfg
        audio_l = transforms.decimate(audio_l, cfg.bufscale)
        audio_r = transforms.decimate(audio_r, cfg.bufscale)
        sources = {"audio_l": audio_l, "audio_r": audio_r}
        w = self.avg_weights
        textures: dict[str, jax.Array] = {}
        fused_idx = {u.name: i for i, u in enumerate(self._fft_uniforms)}
        if self.use_fused:
            # flat (B, 2, m) -> (*batch, U, 2, m) read-only view
            batch = audio_l.shape[:-1]
            U = len(self._fft_uniforms)
            m = self.sz // 2
            avg_view = state[_FUSED_KEY].avg.reshape(batch + (U, 2, m))
        if self._fft_uniforms and not self.use_fused:
            # one age-weighted ring reduction + one presmooth matmul
            # for ALL fft uniforms: (*batch, U, F, sz) -> (*batch, U, sz).
            # slot f holds the frame of age (newest_slot - f) mod F;
            # the GPU-path shader weights frames by AGE
            # (render.c:2252-2256 binds newest-first) while avg_weights
            # is POSITIONAL oldest-first (index F-1-age): flip while
            # rotating. Observable now that the true (shifted) curves
            # are asymmetric.
            st: RingChainState = state[_XLA_KEY]
            F = self.cfg.avg_frames
            newest = jnp.mod(st.count - 1, F)
            ages = jnp.mod(newest[..., None] - jnp.arange(F), F)
            w_rot = w[(F - 1) - ages]             # (*batch, F) tiny gather
            w_b = w_rot.reshape(w_rot.shape[:-1] + (1, F, 1))
            texs = jnp.clip(
                jnp.sum(st.history * w_b, axis=-2), 0.0, 1.0
            )
            if self.presmooth is not None:
                texs = jnp.clip(self.presmooth(texs), 0.0, 1.0)
        for u in self.uniforms:
            if _has_fft(u.transforms):
                if self.use_fused:
                    planes = avg_view[..., fused_idx[u.name], :, :]  # (..., 2, m)
                    re, im = planes[..., 0, :], planes[..., 1, :]
                    if self.presmooth is not None:
                        # resample straight off the complex planes — no
                        # interleave materialization on the hot path
                        tex = jnp.clip(
                            self.presmooth.apply_planes(re, im), 0.0, 1.0
                        )
                    else:
                        tex = jnp.clip(
                            jnp.stack([re, im], axis=-1).reshape(
                                planes.shape[:-2] + (self.sz,)
                            ),
                            0.0, 1.0,
                        )
                    textures[u.name] = tex
                    continue
                textures[u.name] = texs[..., fused_idx[u.name], :]
            else:
                buf = sources[u.source]
                for t in u.transforms:
                    if t == "wrange":
                        buf = transforms.wrange(buf)
                    elif t == "smooth":
                        buf = transforms.smooth_transform(
                            buf, cfg.smooth_ratio, cfg.smooth_distance
                        )
                textures[u.name] = jnp.clip(buf, 0.0, 1.0)
        return textures

    # -- per-stream update gating --------------------------------------------

    def select_updated(self, new_state, old_state, modified: jax.Array):
        """Keep advanced state where ``modified`` (S,) is true, carried
        state elsewhere — the vectorized form of the reference's
        only-transform-on-new-audio rule (render.c:2122)."""
        U = len(self._fft_uniforms)

        def sel_mask(mask, n, o):
            if n.ndim == 0:
                return n  # shared scalars
            mshape = (n.shape[0],) + (1,) * (n.ndim - 1)
            return jnp.where(mask.reshape(mshape), n, o)

        out = dict(new_state)
        for key in new_state:
            if key == _FUSED_KEY:
                maskB = jnp.repeat(modified, U)  # flat rows are s*U + u
                out[key] = jax.tree.map(
                    lambda n, o: sel_mask(maskB, n, o),
                    new_state[key], old_state[key],
                )
            else:
                out[key] = jax.tree.map(
                    lambda n, o: sel_mask(modified, n, o),
                    new_state[key], old_state[key],
                )
        return out

    # -- combined update (advance + textures) -------------------------------

    def update(
        self,
        state: dict[str, Any],
        audio_l: jax.Array,
        audio_r: jax.Array,
        *,
        fft_scale=None,
        fft_cutoff=None,
        gravity_g=None,
    ) -> tuple[dict[str, Any], dict[str, jax.Array]]:
        new_state = self.advance(
            state, audio_l, audio_r,
            fft_scale=fft_scale, fft_cutoff=fft_cutoff, gravity_g=gravity_g,
        )
        return new_state, self.textures_from(new_state, audio_l, audio_r)

    # -- convenience: jitted closure ---------------------------------------

    def jit_update(self):
        def step(state, audio_l, audio_r, fft_scale, fft_cutoff, gravity_g):
            return self.update(
                state,
                audio_l,
                audio_r,
                fft_scale=fft_scale,
                fft_cutoff=fft_cutoff,
                gravity_g=gravity_g,
            )

        return jax.jit(step, donate_argnums=(0,))


def frame_windows(pcm: np.ndarray, bufsize: int, hop: int) -> np.ndarray:
    """Host-side helper: slice a PCM track into overlapping ring snapshots.

    Emulates the capture ring (fifo.c:91-110): window ``k`` holds the
    ``bufsize`` samples ending at ``(k + 1) * hop``, zero-padded on the
    left before enough history accumulates. Returns (n_windows, bufsize).
    """
    n = len(pcm)
    count = max(n // hop, 0)
    out = np.zeros((count, bufsize), dtype=np.float32)
    for k in range(count):
        end = (k + 1) * hop
        start = max(end - bufsize, 0)
        seg = pcm[start:end]
        out[k, bufsize - len(seg):] = seg
    return out
