"""`bars` module: split-center stereo bar spectrum.

Pixel-for-pixel re-expression of shaders/glava/bars/1.frag (plus the
premultiply pass bars/2.frag, gated on USE_ALPHA) as vectorized masked
math. Every column-only quantity (bar index, section position, sample
position, which channel) is precomputed host-side as numpy — the traced
program is one spectrum gather per channel plus (H, W) masks.

Knobs (shaders/glava/bars.glsl): BAR_WIDTH, BAR_GAP, BAR_OUTLINE_WIDTH,
AMPLIFY, GRADIENT, COLOR, BAR_OUTLINE, DIRECTION, INVERT, FLIP,
MIRROR_YX, DISABLE_MONO, USE_ALPHA.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glava_tpu.render import base
from glava_tpu.render.modules import register


@register("bars")
def build(ctx: base.ModuleContext) -> base.ModuleBuild:
    w, h = ctx.screen
    mirror_yx = ctx.knob_i("MIRROR_YX", 0) == 1
    aw, ah = (h, w) if mirror_yx else (w, h)

    bw = ctx.knob_f("BAR_WIDTH", 5)
    gap = ctx.knob_f("BAR_GAP", 1)
    bow = ctx.knob_f("BAR_OUTLINE_WIDTH", 1)
    amplify = ctx.knob_f("AMPLIFY", 300)
    direction = ctx.knob_i("DIRECTION", 0)
    invert = ctx.knob_i("INVERT", 0) == 1
    flip = ctx.knob_i("FLIP", 0) == 1
    disable_mono = ctx.knob_i("DISABLE_MONO", 0) == 1
    use_alpha = ctx.knob_i("USE_ALPHA", 0) == 1
    channels = 2 if (disable_mono or ctx.channels == 2) else 1

    # ---- column-only math (bars/1.frag:50-111), host-side -------------
    ax, ay = base.frag_coords(aw, ah, pixel_center_integer=False)
    if channels == 2:
        dx = ax - (aw // 2)             # GLSL int division screen.x / 2
    elif invert:
        dx = aw - ax
    else:
        dx = ax.copy()

    section = bw + gap
    center = section / 2.0
    m = np.abs(dx - section * np.floor(dx / section))   # GLSL mod()
    md = m - center
    in_bar = (md < np.ceil(bw / 2.0)) & (md >= -np.floor(bw / 2.0))
    inner = (md < np.ceil(bw / 2.0) - bow) & (md >= -np.floor(bw / 2.0) + bow)

    nbars = np.floor((aw * 0.5) / section) * 2.0
    s = dx / section
    p = np.where(s > 0, np.ceil(s), np.floor(s))
    p = p / (nbars / 2.0 if channels == 2 else nbars)
    p = p + np.sign(p) * ((0.5 + center) / aw)
    oob = (p > 1.0) | (p < -1.0)

    pos = np.abs(p)
    if direction == 1:
        pos = 1.0 - pos
    if channels == 1:
        use_right = np.zeros(aw, dtype=bool)
    elif invert:
        use_right = p <= 0                      # else-branch samples audio_r
    else:
        use_right = p > 0
    visible = in_bar & ~oob

    sample = ctx.sampler(np.clip(pos, 0.0, 1.0))
    use_right_c = jnp.asarray(use_right)
    visible_c = jnp.asarray(visible)
    inner_c = jnp.asarray(inner & visible)

    # ---- row-only quantities -------------------------------------------
    d = (ah - ay) if flip else ay               # distance from baseline
    d_col = jnp.asarray(d.astype(np.float32))[:, None]

    color_fn = ctx.color_fn("COLOR")
    outline_fn = ctx.color_fn("BAR_OUTLINE")

    def pass1(inputs: base.PassInputs) -> base.Planes:
        vl = sample(inputs.textures["audio_l"])
        vr = sample(inputs.textures["audio_r"])
        v = jnp.where(use_right_c, vr, vl) * amplify
        v = jnp.where(visible_c, v, -jnp.inf)   # gap/oob columns never draw

        body = d_col < (v - bow)[None, :]       # (AH, AW)
        edge = d_col <= v[None, :]

        color = base.color_planes(color_fn(d=d_col))
        outline = base.color_planes(outline_fn(d=d_col))
        chans = []
        for c in range(4):
            out = jnp.float32(0.0)
            if bow > 0:
                out = jnp.where(edge & ~body, outline[c], out)
                out = jnp.where(body & ~inner_c[None, :], outline[c], out)
                out = jnp.where(body & inner_c[None, :], color[c], out)
            else:
                out = jnp.where(body, color[c], out)
            chans.append(out.T if mirror_yx else out)
        return tuple(chans)

    passes = [pass1]
    # bars/2.frag: premultiply, compiled only when USE_ALPHA == 1
    if use_alpha and ctx.cfg.premultiply_alpha:
        passes.append(base.premultiply_pass)
    return base.ModuleBuild("bars", passes)
