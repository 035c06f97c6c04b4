"""Renderer: config -> one jitted (state, audio) -> (state, frame) step.

The device-side equivalent of ``rd_update`` (glava/render.c:1743-2417):
per frame it runs the audio transform chains (when a new ring snapshot
arrived), optionally interpolates between audio keyframes
(render.c:1792-1809), rasterizes the module's pass chain, and emits an
RGBA frame. Everything is one XLA program; per-frame scalars
(time, interpolation phase, live pipe uniforms) are traced arguments so
nothing recompiles at runtime.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from glava_tpu.config.loader import LoadedConfig, builtin_variables
from glava_tpu.pipeline import AudioPipeline, UniformSpec
from glava_tpu.render.base import (
    ModuleContext, PassInputs, interleave, interleave_u8,
)
from glava_tpu.render.modules import build_module, module_uniforms


class RenderState(NamedTuple):
    chains: dict[str, Any]       # per-uniform transform carries
    key_start: jax.Array         # (2, bufsize) interpolation start keyframe
    key_end: jax.Array           # (2, bufsize) interpolation end keyframe


@dataclass
class Renderer:
    loaded: LoadedConfig
    screen: tuple[int, int] | None = None

    def __post_init__(self):
        cfg = self.cfg = self.loaded.cfg
        if self.screen is None:
            self.screen = (cfg.geometry[2], cfg.geometry[3])
        overrides = getattr(self.loaded, "module_overrides", None)
        self.uniforms = [
            UniformSpec(*u)
            for u in module_uniforms(self.loaded.module, overrides)
        ]
        self.pipeline = AudioPipeline(cfg, self.uniforms)
        env = self.module_env = self.loaded.env
        env.variables.update(builtin_variables(cfg))
        mctx = ModuleContext(
            cfg=cfg,
            env=env,
            screen=self.screen,
            sz=self.pipeline.sz,
            channels=1 if cfg.mirror_input else 2,
        )
        self.module = build_module(self.loaded.module, mctx, overrides)
        # xroot opacity: composite over the supplied wallpaper image,
        # sampled at the window geometry — the capability equivalent of
        # the reference's root-pixmap copy (xwin.c:345-472)
        # per-channel background for the planar composite: (H, W)
        # wallpaper planes (contiguous, built straight from the numpy
        # canvas — no interleaved device copy), or the scalar clear
        # color components
        self._bg_planes = tuple(np.float32(c) for c in cfg.clear_color)
        # When set, the wallpaper composite is LIVE: the engine polls
        # the file and feeds updated planes through the reserved
        # ``__bg__`` pipe argument (the reference re-copies the root
        # pixmap when _XROOTPMAP_ID changes at runtime,
        # glx_wcb.c:341-356 -> render.c:1832-1837 — here a new device
        # array replaces the old one with NO recompile, since the
        # background is a traced argument rather than a baked
        # constant).
        self.bg_path: str | None = None
        if cfg.copy_desktop and cfg.background_image \
                and not cfg.premultiply_alpha:
            self.bg_path = cfg.background_image
            self._bg_planes = tuple(
                jnp.asarray(p) for p in self.load_bg_planes()
            )

    def load_bg_planes(self) -> tuple[np.ndarray, ...]:
        """Read the ``setbgimg`` wallpaper and build the 4 (H, W)
        bottom-up background channel planes sampled at the window
        geometry (the root-pixmap copy, xwin.c:345-472)."""
        from glava_tpu.runtime.sinks import read_png

        cfg = self.cfg
        img = read_png(cfg.background_image).astype(np.float32) / 255.0
        gx, gy = cfg.geometry[0], cfg.geometry[1]
        w, h = self.screen
        canvas = np.broadcast_to(
            np.asarray(cfg.clear_color, np.float32), (h, w, 4)
        ).copy()
        ih, iw = img.shape[:2]
        y0, y1 = max(gy, 0), min(gy + h, ih)
        x0, x1 = max(gx, 0), min(gx + w, iw)
        if y1 > y0 and x1 > x0:
            canvas[y0 - gy:y1 - gy, x0 - gx:x1 - gx] = img[y0:y1, x0:x1]
        canvas[..., 3] = 1.0  # the root pixmap is opaque
        canvas = canvas[::-1]  # bottom-up
        return tuple(canvas[..., c].copy() for c in range(4))

    # -- state -------------------------------------------------------------

    def init_state(self, batch: tuple[int, ...] = ()) -> RenderState:
        cfg = self.cfg
        return RenderState(
            chains=self.pipeline.init_state(batch),
            key_start=jnp.zeros(batch + (2, cfg.bufsize), jnp.float32),
            key_end=jnp.zeros(batch + (2, cfg.bufsize), jnp.float32),
        )

    # -- the jittable step ---------------------------------------------------

    def step_planes(
        self,
        state: RenderState,
        audio: jax.Array,       # (..., 2, bufsize) current ring snapshot
        modified,               # bool scalar: new audio since last frame?
        time,                   # float scalar, seconds (wraps at timecycle)
        interp_mod,             # float scalar: min(uratio*kcounter, 1)
        gravity_g=None,         # float scalar: gravity_step / measured UPS
        pipe: dict | None = None,  # live --pipe uniform values (traced)
    ) -> tuple[RenderState, jax.Array]:
        cfg = self.cfg
        bg_planes = self._bg_planes
        if pipe and "__bg__" in pipe:
            # Reserved key: live background planes as a traced (4, H, W)
            # argument (engine wallpaper polling) — a wallpaper change
            # is a new device array, not a recompile.
            pipe = dict(pipe)
            bg = jnp.asarray(pipe.pop("__bg__"))
            bg_planes = tuple(bg[i] for i in range(4))
        if pipe:
            # Pipe values are traced arguments; expressions referencing
            # @name binds pick them up during this trace. vecN values
            # arrive as (n,) arrays -> component tuples for the
            # evaluator.
            vals = {}
            for k, v in pipe.items():
                arr = jnp.asarray(v)
                vals[k] = tuple(arr[i] for i in range(arr.shape[0])) if arr.ndim else arr
            self.module_env.pipe_values.clear()
            self.module_env.pipe_values.update(vals)

        # Keyframe push on update (render.c:2348-2353): start <- end,
        # end <- new buffers.
        key_start = jnp.where(modified, state.key_end, state.key_start)
        key_end = jnp.where(modified, audio, state.key_end)

        if cfg.interpolate and not cfg.accel_fft:
            # CPU-path interpolation (render.c:1792-1809). The accel
            # path force-disables it (render.c:2161-2173).
            feed = key_start + (key_end - key_start) * jnp.minimum(interp_mod, 1.0)
            # interpolated feed changes every frame; transforms rerun
            chains = self.pipeline.advance(
                state.chains, feed[..., 0, :], feed[..., 1, :], gravity_g=gravity_g
            )
        else:
            feed = key_end
            # Transforms run only when new audio arrived (render.c:2122);
            # otherwise the carried state is reused (render.c:2268-2272).
            chains = jax.lax.cond(
                jnp.asarray(modified, jnp.bool_),
                lambda c: self.pipeline.advance(
                    c, feed[..., 0, :], feed[..., 1, :], gravity_g=gravity_g
                ),
                lambda c: c,
                state.chains,
            )

        textures = self.pipeline.textures_from(
            chains, feed[..., 0, :], feed[..., 1, :]
        )
        planes = self.module.render(
            PassInputs(prev=None, textures=textures, time=jnp.asarray(time))
        )
        if not cfg.premultiply_alpha:
            # xroot/none opacity: the final draw blends src-alpha over
            # the background (render.c:1468-1469, 1700, 2028). xroot
            # mode composites over a `setbgimg` wallpaper when supplied
            # (the root-pixmap-copy capability, xwin.c:345-472),
            # falling back to the `setbg` clear color. Per channel —
            # alpha composites against the background alpha too, like
            # the interleaved `frame * a + bg * (1 - a)`.
            a = planes[3]
            planes = tuple(
                c * a + b * (1.0 - a)
                for c, b in zip(planes, bg_planes)
            )
        return RenderState(chains, key_start, key_end), planes

    def step(self, *args, **kwargs) -> tuple[RenderState, jax.Array]:
        """:meth:`step_planes` + the single interleaved (H, W, 4)
        materialization (the only point the RGBA layout exists)."""
        st, planes = self.step_planes(*args, **kwargs)
        return st, interleave(planes, self.screen[1], self.screen[0])

    def jit_step(self, quantize: bool = False, yuv420: bool = False):
        """Jitted step; with ``quantize`` the frame is converted to
        uint8 on device (4x less device->host traffic per frame); with
        ``yuv420`` it is packed to (Y, U, V) uint8 planes with 2x2-mean
        chroma subsampling ON DEVICE — 1.5 B/px on the wire instead of
        RGBA8's 4 (2.7x less D2H; the serving loop is transfer-bound on
        slow links, docs/STATUS.md in-flight table). BT.601 full-range
        matrix, planes flipped to top-down scan order, every stage
        round-to-nearest (pinned by tests/test_runtime.py yuv goldens).
        Requires even frame dimensions. Both wire formats consume the
        channel planes directly — the interleaved RGBA layout never
        materializes for them."""
        h, w = self.screen[1], self.screen[0]
        if yuv420:
            if h % 2 or w % 2:
                raise ValueError("yuv420 packing needs even dimensions")

            def step(state, audio, modified, time, interp_mod,
                     gravity_g, pipe):
                st, planes = self.step_planes(
                    state, audio, modified, time, interp_mod,
                    gravity_g, pipe
                )
                # ONE contiguous buffer: three separate little D2H
                # fetches would pay three link round-trips per frame
                # (measured: it inverts the win on small frames)
                yuv = yuv420_pack_planes(planes, h, w)
                packed = jnp.concatenate([p.reshape(-1) for p in yuv])
                return st, packed

            return jax.jit(step, donate_argnums=(0,))
        if not quantize:
            return jax.jit(self.step, donate_argnums=(0,))

        def step(state, audio, modified, time, interp_mod, gravity_g, pipe):
            st, planes = self.step_planes(
                state, audio, modified, time, interp_mod, gravity_g, pipe
            )
            # quantize per channel, interleave in uint8 (4x smaller
            # stack than f32)
            return st, interleave_u8(planes, h, w)

        return jax.jit(step, donate_argnums=(0,))

    # -- golden-frame evaluation (render.c:2419-2453) -----------------------

    def test_evaluate(self, frame: jax.Array) -> bool:
        """Assert every pixel equals `settesteval` within +-0.5/255."""
        expect = self.cfg.test_eval_color
        if expect is None:
            raise ValueError("no `settesteval` color configured")
        got = np.asarray(frame)
        if got.dtype == np.uint8:
            got = got.astype(np.float64) / 255.0
        else:
            got = got.astype(np.float64)
        want = np.asarray(expect, dtype=np.float64)
        return bool(np.all(np.abs(got - want) <= 0.5 / 255.0 + 1e-9))


def make_renderer(loaded: LoadedConfig, screen: tuple[int, int] | None = None) -> Renderer:
    return Renderer(loaded, screen)


def quantize_frame(frame: jax.Array) -> np.ndarray:
    """f32 RGBA [0,1] -> uint8, GL-style round-to-nearest."""
    arr = np.asarray(frame)
    return np.clip(np.rint(arr * 255.0), 0, 255).astype(np.uint8)


def yuv420_pack_planes(planes, h: int, w: int):
    """Planar form of :func:`yuv420_pack` — same per-element math
    (bit-identical), but consumes the channel planes directly so the
    interleaved RGBA buffer never materializes on the wire path."""
    rgb = []
    for p in planes[:3]:
        p = jnp.broadcast_to(jnp.asarray(p, jnp.float32), (h, w))
        v255 = jnp.clip(jnp.round(p * 255.0), 0.0, 255.0)
        rgb.append(v255[::-1])
    r, g, b = rgb
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h2, w2 = h // 2, w // 2

    def ds(p):
        return p.reshape(h2, 2, w2, 2).mean(axis=(1, 3))

    def to8(p):
        return jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8)

    return to8(y), to8(ds(u)), to8(ds(v))


def yuv420_pack(frame: jax.Array):
    """f32 RGBA [0,1] (h, w, 4), GL bottom-up -> (Y, U, V) uint8
    planes, top-down, BT.601 full-range, 2x2-mean chroma (C420jpeg
    siting). Runs on device under jit — the wire then carries
    1.5 B/px instead of 4."""
    v255 = jnp.clip(jnp.round(frame * 255.0), 0.0, 255.0)
    img = v255[::-1]
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h2, w2 = r.shape[0] // 2, r.shape[1] // 2

    def ds(p):
        return p.reshape(h2, 2, w2, 2).mean(axis=(1, 3))

    def to8(p):
        return jnp.clip(jnp.round(p), 0.0, 255.0).astype(jnp.uint8)

    return to8(y), to8(ds(u)), to8(ds(v))


def yuv420_pack_host(frame_u8: np.ndarray):
    """Numpy mirror of :func:`yuv420_pack` for sinks fed RGBA8 frames
    by a non-packing step (same matrix/rounding; diff vs the device
    path is <= 1 LSB from f32 fma ordering)."""
    img = frame_u8[::-1].astype(np.float32)
    r, g, b = img[..., 0], img[..., 1], img[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    u = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    v = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    h2, w2 = r.shape[0] // 2, r.shape[1] // 2

    def ds(p):
        return p.reshape(h2, 2, w2, 2).mean(axis=(1, 3))

    def to8(p):
        return np.clip(np.rint(p), 0, 255).astype(np.uint8)

    return to8(y), to8(ds(u)), to8(ds(v))
