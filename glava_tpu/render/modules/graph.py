"""`graph` module: filled stereo spectrum graph (4 passes).

The deepest multi-pass module in the reference:

* pass 1 (graph/1.frag)  — filled columns from 3-tap smoothed samples
  with end-clamp easing and optional channel joining.
* pass 2 (graph/2.frag)  — outline / edge highlight; disabled when
  both DRAW_OUTLINE and DRAW_HIGHLIGHT are 0 (`#error __disablestage`).
* pass 3 (graph/3.frag)  — column anti-aliasing; disabled unless
  ANTI_ALIAS. The reference walks pixels up/down per column; since
  pass 1 output is a contiguous fill, the walk reduces to per-column
  top indices, which we compute vectorized.
* pass 4 (graph/4.frag)  — premultiply.

Knobs (shaders/glava/graph.glsl): VSCALE, DIRECTION, GRADIENT, COLOR,
DRAW_OUTLINE, DRAW_HIGHLIGHT, ANTI_ALIAS, OUTLINE, JOIN_CHANNELS,
INVERT.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glava_tpu.render import base
from glava_tpu.render.modules import register


@register("graph")
def build(ctx: base.ModuleContext) -> base.ModuleBuild:
    w, h = ctx.screen
    vscale = ctx.knob_f("VSCALE", 300)
    direction = ctx.knob_i("DIRECTION", 1)
    draw_outline = ctx.knob_i("DRAW_OUTLINE", 0)
    draw_highlight = ctx.knob_i("DRAW_HIGHLIGHT", 1)
    anti_alias = ctx.knob_i("ANTI_ALIAS", 0)
    join = ctx.knob_i("JOIN_CHANNELS", 0)
    invert = ctx.knob_i("INVERT", 0)
    outline = base.color_planes(ctx.color_fn("OUTLINE")())
    color_fn = ctx.color_fn("COLOR")

    # ---- static column math (graph/1.frag:62-104) -----------------------
    x, _ = base.frag_coords(w, h, pixel_center_integer=True)
    half_w = float(w // 2)  # float(screen.x / 2): int division
    pixel = 1.0 / float(w)
    left_mask = x < half_w

    if direction < 0:
        left_idx, right_idx = x, -x + w
    else:
        left_idx, right_idx = half_w - x, x - half_w
    idx = np.where(left_mask, left_idx, right_idx) / half_w

    def adj_positions(i):
        """smooth_audio_adj taps (smooth.glsl:67-73)."""
        return np.stack(
            [np.maximum(i - pixel, 0.0), i, np.minimum(i + pixel, 1.0)], axis=-1
        )

    col_pos = np.clip(adj_positions(idx), 0.0, 1.0)        # (W, 3)
    mid_pos = np.clip(adj_positions(np.array([1.0, 0.0])), 0.0, 1.0)  # (2, 3)
    sample_cols = ctx.sampler(col_pos)
    sample_mid = ctx.sampler(mid_pos)

    fact_c = np.clip((np.abs(w // 2 - x) / w) * 48.0, 0.0, 1.0)
    if join > 0:
        fact_c = -2.0 * fact_c**3 + 3.0 * fact_c**2
    fact_e = np.clip((np.minimum(x, w - x) / w) * 48.0, 0.0, 1.0)

    left_mask_c = jnp.asarray(left_mask)
    fact_c_j = jnp.asarray(fact_c.astype(np.float32))
    fact_e_j = jnp.asarray(fact_e.astype(np.float32))

    _, yrow = base.frag_coords(w, h, pixel_center_integer=True)
    d_rows = (float(h) - yrow) if invert > 0 else yrow
    d_col = jnp.asarray(d_rows.astype(np.float32))[:, None]

    def line_heights(textures) -> jnp.ndarray:
        """Per-column s (graph/1.frag:87-104), shape (W,)."""
        sl = jnp.mean(sample_cols(textures["audio_l"]), axis=-1)
        sr = jnp.mean(sample_cols(textures["audio_r"]), axis=-1)
        s = jnp.where(left_mask_c, sl, sr) * vscale
        if join > 0:
            ml = jnp.mean(sample_mid(textures["audio_l"]), axis=-1)[0]
            mr = jnp.mean(sample_mid(textures["audio_r"]), axis=-1)[1]
            middle = vscale * (ml + mr) / 2.0
            s = fact_c_j * s + (1.0 - fact_c_j) * middle
        else:
            s = s * fact_c_j
        return s * fact_e_j

    def pass1(inputs: base.PassInputs) -> base.Planes:
        s = line_heights(inputs.textures)
        mask = (d_col + 1.5) <= s[None, :]
        color = base.color_planes(color_fn(pos=d_col))
        return tuple(jnp.where(mask, color[c], 0.0) for c in range(4))

    passes = [pass1]

    # graph/2.frag — outline + highlight
    if draw_outline > 0 or draw_highlight > 0:
        def pass2(inputs: base.PassInputs) -> base.Planes:
            frame = inputs.prev
            alpha = frame[3]
            hh, ww = alpha.shape
            # graph/2.frag only ever consumes avg.A (the outline
            # branch writes a constant; the highlight multiplies by
            # avg.a) — so only the alpha plane feeds the neighborhood
            # average; the rgb planes see one select each
            # tap_source: one materialized alpha plane instead of
            # re-deriving pass 1 inside every shifted-window fusion
            alpha = base.tap_source(alpha)
            ap = jnp.pad(alpha, ((1, 1), (1, 1)))

            def sh(dy, dx):
                return ap[1 + dy: 1 + dy + hh, 1 + dx: 1 + dx + ww]

            avg_a = (
                2.0 * sh(0, 1) + sh(1, 1) + sh(1, 0) + 2.0 * sh(0, -1)
                + sh(-1, -1) + sh(-1, 0)
            ) / 8.0
            near = avg_a > 0
            out = list(frame)
            if draw_outline > 0:
                m = near & (alpha <= 0)
                out = [jnp.where(m, outline[c], out[c]) for c in range(4)]
            if draw_highlight > 0:
                m = near & (alpha > 0) & (avg_a < 1)
                out[:3] = [
                    jnp.where(m, out[c] * (avg_a * 2.0), out[c])
                    for c in range(3)
                ]
            return tuple(out)

        passes.append(pass2)

    # graph/3.frag — anti-alias: alpha-feather empty pixels between the
    # tops of adjacent columns.
    if anti_alias > 0:
        def pass3(inputs: base.PassInputs) -> base.Planes:
            frame = inputs.prev
            # contiguous fill: colored rows of column x are d in
            # [0, s-1.5] -> top index ty = floor(s - 1.5) in d-space
            s = line_heights(inputs.textures)
            ty = jnp.floor(s - 1.5)
            ty_l = jnp.concatenate([jnp.full((1,), -1.0), ty[:-1]])
            ty_r = jnp.concatenate([ty[1:], jnp.full((1,), -1.0)])
            dpix = d_col  # (H, 1) distance-from-base of each row
            empty = frame[3] <= 0
            # left neighbor colored at this row?
            lcol = dpix <= ty_l[None, :]
            rcol = dpix <= ty_r[None, :]
            h2 = ty  # own column top (first colored going down)
            # fragment color of (x, h2): gather per column from frame
            rows = jnp.clip(ty, 0, h - 1).astype(jnp.int32)
            if invert > 0:
                # d = h - y (graph/1.frag:111): pixel row of distance d
                rows_pix = jnp.clip(h - rows, 0, h - 1)
            else:
                rows_pix = rows
            col_ids = jnp.arange(w)
            # (W,) per-channel top-of-column colors
            top_col = [frame[c][rows_pix, col_ids] for c in range(4)]
            af_l = jnp.clip(
                jnp.abs((ty_l[None, :] - dpix) / (h2 - ty_l)[None, :]), 0.0, 1.0
            )
            af_r = jnp.clip(
                jnp.abs((ty_r[None, :] - dpix) / (h2 - ty_r)[None, :]), 0.0, 1.0
            )
            a_fact = jnp.where(lcol, af_l, 0.0)
            a_fact = jnp.maximum(a_fact, jnp.where(rcol, af_r, 0.0))
            feather = empty & (lcol | rcol)
            new = [top_col[c][None, :] for c in range(3)]
            new.append(top_col[3][None, :] * a_fact)
            return tuple(
                jnp.where(feather, new[c], frame[c]) for c in range(4)
            )

        passes.append(pass3)

    if ctx.cfg.premultiply_alpha:
        passes.append(base.premultiply_pass)  # graph/4.frag

    return base.ModuleBuild("graph", passes)
