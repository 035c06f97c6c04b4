"""`wave` module: raw time-domain waveform line.

Re-expression of shaders/glava/wave/{1,2}.frag. Uses only the
window (no-op) + wrange transforms — the texture holds raw PCM mapped
to [0, 1] (wave/1.frag:7-9). Pass 1 draws the line with adaptive
thickness; pass 2 is an unconditional neighborhood outline pass.

Knobs (shaders/glava/wave.glsl): MIN_THICKNESS, MAX_THICKNESS,
BASE_COLOR, AMPLIFY, OUTLINE.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glava_tpu.render import base
from glava_tpu.render.modules import register


def _texture_nearest_repeat(coords: np.ndarray, sz: int) -> np.ndarray:
    """GL `texture()` lookup indices: NEAREST filter, REPEAT wrap
    (render.c:512-517)."""
    u = coords - np.floor(coords)
    return np.minimum(np.floor(u * sz), sz - 1).astype(np.int32)


@register(
    "wave",
    uniforms=(("audio_l", "audio_l", ("window", "wrange")),),  # wave/1.frag:7-9
)
def build(ctx: base.ModuleContext) -> base.ModuleBuild:
    w, h = ctx.screen
    min_t = ctx.knob_f("MIN_THICKNESS", 1)
    max_t = ctx.knob_f("MAX_THICKNESS", 6)
    amplify = ctx.knob_f("AMPLIFY", 500)
    base_color = base.color_planes(ctx.color_fn("BASE_COLOR")())
    outline = base.color_planes(ctx.color_fn("OUTLINE")())

    # pixel_center_integer: integer fragment coords (wave/1.frag:2)
    x, y = base.frag_coords(w, h, pixel_center_integer=True)
    idx0 = jnp.asarray(_texture_nearest_repeat(x / w, ctx.sz))
    idxm = jnp.asarray(_texture_nearest_repeat((x - 1) / w, ctx.sz))
    idxp = jnp.asarray(_texture_nearest_repeat((x + 1) / w, ctx.sz))
    y_col = jnp.asarray(y.astype(np.float32))[:, None]

    def pass1(inputs: base.PassInputs) -> jnp.ndarray:
        tex = inputs.textures["audio_l"]

        def index(ix):
            return (tex[ix] - 0.5) * amplify + 0.5

        os_ = index(idx0)
        s0 = index(idxm) - os_
        s1 = index(idxp) - os_
        dmax = jnp.maximum(s0, s1)
        dmin = jnp.minimum(s0, s1)

        s = os_ + (h * 0.5) - 0.5
        diff = y_col - s[None, :]
        thick = jnp.clip(jnp.abs(s - (h * 0.5)) * 6.0, min_t, max_t)
        on_line = jnp.abs(diff) < thick[None, :]
        in_slope = (diff <= dmax[None, :]) & (diff >= dmin[None, :])
        mask = on_line | in_slope

        # BASE_COLOR + scalar brightens all components incl. alpha
        # (wave/1.frag:35)
        bright = (jnp.abs((h * 0.5) - s) * 0.02)[None, :]
        return tuple(
            jnp.where(mask, base_color[c] + bright, 0.0) for c in range(4)
        )

    def pass2(inputs: base.PassInputs) -> base.Planes:
        return neighbor_outline_pass(inputs.prev, outline, edge_columns=True)

    return base.ModuleBuild("wave", [pass1, pass2])


def neighbor_outline_pass(
    frame: base.Planes, outline: list, edge_columns: bool
) -> base.Planes:
    """The 8-fetch neighborhood average outline (wave/2.frag:14-32).

    The reference fetches (+1,0) and (-1,0) twice each (a0==a3,
    a4==a7); we reproduce that weighting. Out-of-bounds texelFetch
    reads as transparent black (zero padding). Operating on channel
    planes, only the alpha plane feeds the neighborhood average — the
    rgb planes are touched by one select each.
    """
    alpha = base.tap_source(frame[3])
    h, w = alpha.shape
    p = jnp.pad(alpha, ((1, 1), (1, 1)))

    def sh(dy, dx):  # neighbor alpha at (x+dx, y+dy)
        return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

    avg_a = (
        2.0 * sh(0, 1) + sh(1, 1) + sh(1, 0) + 2.0 * sh(0, -1)
        + sh(-1, -1) + sh(-1, 0)
    ) / 8.0
    cond = avg_a > 0
    inner = alpha <= 0
    if edge_columns:
        col = jnp.arange(w)
        inner = inner | (col == 0)[None, :] | (col == w - 1)[None, :]
    mask = cond & inner
    return tuple(jnp.where(mask, outline[c], frame[c]) for c in range(4))
