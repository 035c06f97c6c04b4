"""Module protocol and shared rasterization helpers.

Frame convention: **planar** — a 4-tuple of channel planes
``(r, g, b, a)``, each broadcastable to (H, W) float32, with **row 0
at the bottom** (GL fragment coordinates, matching the reference's
offscreen renders read with glReadPixels). The interleaved (H, W, 4)
RGBA array is materialized exactly once, by :func:`interleave` in
``Renderer.step`` — frame sinks then flip to image convention when
exporting.

Planar is the TPU-native layout: an interleaved (H, W, 4) array maps
its minor dim onto 4 of 128 vector lanes, and every pass boundary
would pay a 33 MB concatenate + re-slice at 1080p (measured ~1/3 of
the interpreted modules' HBM traffic). With per-channel planes those
relayouts vanish, XLA dead-codes channels a pass never reads (the
outline passes consume only alpha), and constant channels stay numpy
(concrete) across pass boundaries.

A module build produces a list of pass functions; pass ``k+1`` receives
pass ``k``'s output as ``prev`` (the reference's indirect FBO chain,
render.c:1556-1563, 2314-2330). A pass may return either channel
planes (a 3/4-tuple; alpha defaults to 1) or a legacy interleaved
(H, W, 4) array — :func:`as_planes` normalizes. A pass that raises
:class:`StageDisabled` at build time is skipped — the equivalent of the
``#error __disablestage`` convention (render.c:358-371, e.g.
shaders/glava/graph/2.frag:12-14).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from glava_tpu.config import glsl_expr
from glava_tpu.config.state import RenderConfig
from glava_tpu.ops import smoothing


class StageDisabled(Exception):
    """Raised by a pass builder to skip itself (``#error __disablestage``)."""


# one channel plane: a jnp/numpy array or scalar broadcastable to (H, W)
Chan = Any
# a frame: (r, g, b, a) channel planes
Planes = tuple

# Plane-size regime boundary for the shifted-tap materialization
# barrier (see tap_source): measured on v5e, >= 1080p planes always
# win or wash with the barrier, <= 512x256 planes can lose 2-6x.
# Same boundary as the engine's YUV420 wire gate (engine.py).
PREV_MAT_MIN_ELEMS = 1 << 19

_PREV_MAT_WARNED: set = set()


def prev_mat_mode() -> str:
    """Validated GLAVA_TPU_PREV_MAT mode: '1' forces the shifted-tap
    barrier on, '0' forces it off, 'auto' (default) size-gates it.
    Anything else would silently fall through to auto at both gate
    sites (here and glsl_shader's _prev_src), masking a typo when the
    intent was to force — warn once and use auto (docs/CLI.md
    contract: '=1/=0 force')."""
    import os

    raw = os.environ.get("GLAVA_TPU_PREV_MAT", "auto")
    if raw in ("0", "1", "auto"):
        return raw
    if raw not in _PREV_MAT_WARNED:
        _PREV_MAT_WARNED.add(raw)
        import warnings

        warnings.warn(
            f"GLAVA_TPU_PREV_MAT={raw!r} is not '1'/'0'/'auto'; "
            "using 'auto' (size-gated)", stacklevel=2)
    return "auto"


class PassInputs(NamedTuple):
    prev: Planes | None             # previous pass output channel planes
    textures: dict[str, jax.Array]  # uniform name -> (sz,) spectrum texture
    time: jax.Array                 # traced seconds (wraps at `timecycle`)


PassFn = Callable[[PassInputs], Any]


def _np_like(v) -> bool:
    return isinstance(v, (np.ndarray, np.generic, int, float, bool))


def as_planes(out) -> Planes:
    """Normalize a pass return value to 4 float32 channel planes.

    Accepts a 3/4-tuple of channels (alpha defaults to 1), or a legacy
    interleaved (H, W, 4) array (split per channel). Numpy channels
    stay numpy (concrete constants fold at trace time); traced channels
    are cast to float32 like the old per-pass ``astype``."""
    if isinstance(out, (tuple, list)):
        comps = list(out)
        if len(comps) == 3:
            comps.append(1.0)
        if len(comps) != 4:
            raise TypeError(f"pass returned {len(comps)} channels")
    elif hasattr(out, "ndim") and out.ndim == 3 and out.shape[-1] == 4:
        comps = [out[..., c] for c in range(4)]
    else:
        raise TypeError(f"pass returned {type(out).__name__}, expected "
                        "channel planes or an (H, W, 4) array")

    def cast(p):
        if _np_like(p):
            return np.asarray(p, np.float32)
        return p if p.dtype == jnp.float32 else p.astype(jnp.float32)

    return tuple(cast(p) for p in comps)


def tap_source(p):
    """Materialization barrier for a plane that shifted neighbor taps
    will slice (pad + offset windows).

    Without it XLA duplicates the plane's producing expression into
    every shifted-window consumer fusion instead of fusing it once —
    each such fusion re-reads ALL the producer's operands from HBM
    (TPU-HLO rank of interpreted circle @1080p: ~12 pad/slice/concat
    fusions x ~85 MB of re-read operands ≈ 1 GB/frame of the total
    1.6 GB). ``lax.optimization_barrier`` forces one materialization
    that the taps then slice. Numpy planes pass through untouched
    (concrete constants must stay foldable). Identity on values —
    outputs are bit-identical.

    Default is SIZE-GATED (the one-process TPU A/Bs,
    scripts/exp_tapmat_native_ab.py + exp_prevmat_ab.py, v5e): at
    1080p the barrier never loses and wave wins 23% native / 3.1x
    interpreted, but at 512x256 it catastrophically loses a fusion
    draw per round (native wave 5.1k vs 29.6k, graph 11.7k vs 26.7k
    fps) — small frames fit the duplicated recompute in-fusion and
    the forced materialization only adds a round-trip. Barrier on
    iff the plane has >= 2**19 elements (same regime boundary as the
    YUV420 wire gate). GLAVA_TPU_PREV_MAT=1 forces on, =0 forces
    off."""
    if _np_like(p):
        return p
    mode = prev_mat_mode()
    if mode == "0" or (mode != "1" and p.size < PREV_MAT_MIN_ELEMS):
        return p
    return jax.lax.optimization_barrier(p)


def clip_planes(planes: Planes, lo: float = 0.0, hi: float = 1.0) -> Planes:
    """Per-channel [lo, hi] clamp, numpy-preserving."""
    return tuple(
        np.clip(p, np.float32(lo), np.float32(hi)) if _np_like(p)
        else jnp.clip(p, lo, hi)
        for p in planes
    )


def interleave(planes: Planes, h: int, w: int) -> jax.Array:
    """Channel planes -> the final (H, W, 4) float32 RGBA array (the
    single interleaved materialization per frame)."""
    comps = [
        jnp.broadcast_to(jnp.asarray(p, jnp.float32), (h, w)) for p in planes
    ]
    return jnp.stack(comps, axis=-1)


def interleave_u8(planes: Planes, h: int, w: int) -> jax.Array:
    """Channel planes -> (H, W, 4) uint8 RGBA: round-to-nearest
    quantize per channel plane, THEN interleave — the single RGBA
    materialization is 4x smaller than stacking in f32 first. Matches
    ``clip(round(f * 255))`` of the f32 frame bit-exactly."""
    comps = [
        jnp.clip(
            jnp.round(
                jnp.broadcast_to(jnp.asarray(p, jnp.float32), (h, w)) * 255.0
            ), 0, 255,
        ).astype(jnp.uint8)
        for p in planes
    ]
    return jnp.stack(comps, axis=-1)


@dataclass
class ModuleContext:
    """Everything a module's build step needs."""

    cfg: RenderConfig
    env: glsl_expr.Env             # knob environment (module + user overrides)
    screen: tuple[int, int]        # (width, height) pixels, static
    sz: int                        # spectrum texture size (scaled bufsize)
    channels: int = 2              # 1 when `setmirror true` (render.c:289)

    # -- knob readers ---------------------------------------------------

    def knob_f(self, name: str, default: float | None = None) -> float:
        if name not in self.env.defines and name not in self.env.variables:
            if default is None:
                raise KeyError(f"module knob '{name}' is not defined")
            return default
        v = self.env.lookup(name)
        if isinstance(v, bool):
            return float(v)
        return float(v)

    def knob_i(self, name: str, default: int | None = None) -> int:
        return int(self.knob_f(name, None if default is None else float(default)))

    def knob_raw(self, name: str, default: str | None = None) -> str:
        if name in self.env.defines:
            return self.env.defines[name].strip()
        if default is None:
            raise KeyError(f"module knob '{name}' is not defined")
        return default

    def color_fn(self, name: str) -> Callable[..., Any]:
        """Knob -> callable evaluating a (possibly per-pixel) color.

        The expression may reference runtime variables (``d``, ``pos``)
        which the caller binds as jnp arrays; the result is a component
        tuple for :func:`glsl_expr.to_rgba`.
        """
        expr = self.env.defines.get(name)
        if expr is None:
            raise KeyError(f"module knob '{name}' is not defined")

        def evaluate(**vars):
            env = glsl_expr.Env(
                defines=self.env.defines,
                variables={**self.env.variables, **vars},
                pipe_values=self.env.pipe_values,
            )
            return glsl_expr.evaluate(expr, env)

        return evaluate

    # -- spectrum sampling -----------------------------------------------

    @property
    def smooth_params(self) -> smoothing.SmoothParams:
        return smoothing.SmoothParams(
            factor=self.cfg.smooth_factor,
            sample_mode=self.knob_raw("SAMPLE_MODE", "average"),
            hybrid_weight=self.knob_f("SAMPLE_HYBRID_WEIGHT", 0.65),
            sample_scale=self.knob_f("SAMPLE_SCALE", 8.0),
            sample_range=self.knob_f("SAMPLE_RANGE", 0.9),
            round_formula=self.knob_raw("ROUND_FORMULA", "sinusoidal"),
        )

    def sampler(self, positions: np.ndarray) -> Callable[[jax.Array], jax.Array]:
        """smooth_audio at static positions in [0, 1] -> fn(tex) -> values.

        With the default smooth pass enabled, textures arrive
        pre-smoothed and sampling is the reference's texel fetch
        ``tex[round(idx * sz)]`` (smooth.glsl:61-63); otherwise the
        full resample kernel is baked for these positions.
        """
        positions = np.asarray(positions, dtype=np.float64)
        if self.cfg.smooth_pass:
            idx = np.clip(
                np.round(positions * self.sz).astype(np.int32), 0, self.sz - 1
            )
            idx_c = jnp.asarray(idx)
            return lambda tex: tex[..., idx_c]
        op = smoothing.build_resample(self.sz, positions.ravel(), self.smooth_params)
        shape = positions.shape
        return lambda tex: op(tex).reshape(tex.shape[:-1] + shape)


@dataclass
class ModuleBuild:
    """A compiled module: ordered enabled passes."""

    name: str
    passes: list[PassFn] = field(default_factory=list)

    def render(self, inputs: PassInputs) -> Planes:
        out = inputs.prev
        for fn in self.passes:
            out = as_planes(fn(PassInputs(out, inputs.textures, inputs.time)))
            # stage FBOs are 8-bit normalized color attachments
            # (render.c:543-556): every pass write clamps to [0, 1]
            out = clip_planes(out)
        return out


# ---------------------------------------------------------------------------
# shared pass pieces
# ---------------------------------------------------------------------------

def premultiply_pass(inputs: PassInputs) -> Planes:
    """util/premultiply.frag: rgb *= a."""
    r, g, b, a = inputs.prev
    return (r * a, g * a, b * a, a)


def frag_coords(w: int, h: int, pixel_center_integer: bool) -> tuple[np.ndarray, np.ndarray]:
    """gl_FragCoord.x (W,) and .y (H,) — half-integer centers unless the
    pass declares ``layout(pixel_center_integer)``."""
    off = 0.0 if pixel_center_integer else 0.5
    x = np.arange(w, dtype=np.float64) + off
    y = np.arange(h, dtype=np.float64) + off
    return x, y


def color_planes(value) -> list:
    """Evaluated color (component tuple / scalar) -> 4 broadcastable
    float32 channel components, numpy-preserving (concrete colors stay
    concrete so downstream masks fold)."""
    if not isinstance(value, tuple):
        value = (value, value, value, value)
    if len(value) == 3:
        value = (*value, 1.0)
    return [
        np.asarray(c, np.float32) if _np_like(c)
        else jnp.asarray(c, jnp.float32)
        for c in value
    ]
