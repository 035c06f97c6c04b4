"""Module protocol and shared rasterization helpers.

Frame convention: (H, W, 4) float32 RGBA with **row 0 at the bottom**
(GL fragment coordinates, matching the reference's offscreen renders
read with glReadPixels). Frame sinks flip to image convention when
exporting.

A module build produces a list of pass functions; pass ``k+1`` receives
pass ``k``'s output as ``prev`` (the reference's indirect FBO chain,
render.c:1556-1563, 2314-2330). A pass that raises
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


class PassInputs(NamedTuple):
    prev: jax.Array | None          # (H, W, 4) previous pass output
    textures: dict[str, jax.Array]  # uniform name -> (sz,) spectrum texture
    time: jax.Array                 # traced seconds (wraps at `timecycle`)


PassFn = Callable[[PassInputs], jax.Array]


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

    def render(self, inputs: PassInputs) -> jax.Array:
        out = inputs.prev
        for fn in self.passes:
            out = fn(PassInputs(out, inputs.textures, inputs.time))
            # stage FBOs are 8-bit normalized color attachments
            # (render.c:543-556): every pass write clamps to [0, 1]
            out = jnp.clip(out, 0.0, 1.0)
        return out


# ---------------------------------------------------------------------------
# shared pass pieces
# ---------------------------------------------------------------------------

def premultiply_pass(inputs: PassInputs) -> jax.Array:
    """util/premultiply.frag: rgb *= a."""
    f = inputs.prev
    return jnp.concatenate([f[..., :3] * f[..., 3:4], f[..., 3:4]], axis=-1)


def transparent(h: int, w: int) -> jax.Array:
    return jnp.zeros((h, w, 4), jnp.float32)


def frag_coords(w: int, h: int, pixel_center_integer: bool) -> tuple[np.ndarray, np.ndarray]:
    """gl_FragCoord.x (W,) and .y (H,) — half-integer centers unless the
    pass declares ``layout(pixel_center_integer)``."""
    off = 0.0 if pixel_center_integer else 0.5
    x = np.arange(w, dtype=np.float64) + off
    y = np.arange(h, dtype=np.float64) + off
    return x, y


def rgba(value, h: int, w: int) -> jax.Array:
    """Broadcast an evaluated color (component tuple) to (H, W, 4)."""
    arr = glsl_expr.to_rgba(value)
    return jnp.broadcast_to(arr, (h, w, 4)).astype(jnp.float32)


def over_where(mask: jax.Array, color: jax.Array, base: jax.Array) -> jax.Array:
    """Select `color` where mask (H, W) is true."""
    return jnp.where(mask[..., None], color, base)
