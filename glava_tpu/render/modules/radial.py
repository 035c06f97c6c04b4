"""`radial` module: bar spectrum around a circle.

Re-expression of shaders/glava/radial/1.frag (in-shader alpha
anti-aliasing via the APPLY_FRAG blend, radial/1.frag:34-39) plus the
premultiply pass radial/2.frag. The per-pixel polar math is static, so
bar ids, in-bar masks and alias factors bake to numpy constants; the
traced work is one (NBARS,) spectrum sample per channel and mask
blends.

Knobs (shaders/glava/radial.glsl): C_RADIUS, C_LINE, OUTLINE, NBARS,
BAR_WIDTH, AMPLIFY, GRADIENT, COLOR, ROTATE, INVERT, BAR_ALIAS_FACTOR,
C_ALIAS_FACTOR, CENTER_OFFSET_X/Y, BAR_OUTLINE, BAR_OUTLINE_WIDTH.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glava_tpu.render import base
from glava_tpu.render.modules import register

TWOPI = 6.28318530718
PI = 3.14159265359


def _apply_frag(f, c, use_alpha: bool):
    """APPLY_FRAG (radial/1.frag:35): alpha blend channel planes c over
    premultiplied channel planes f."""
    if not use_alpha:
        return tuple(c)
    fa = jnp.clip(f[3], 0.0, 1.0)
    rgb = [f[k] * f[3] + c[k] * (1.0 - fa) for k in range(3)]
    return (*rgb, jnp.maximum(c[3], f[3]))


@register("radial")
def build(ctx: base.ModuleContext) -> base.ModuleBuild:
    w, h = ctx.screen
    c_radius = ctx.knob_f("C_RADIUS", 128)
    c_line = ctx.knob_f("C_LINE", 2)
    nbars = ctx.knob_i("NBARS", 160)
    bar_width = ctx.knob_f("BAR_WIDTH", 4.5)
    amplify = ctx.knob_f("AMPLIFY", 300)
    rotate = ctx.knob_f("ROTATE", PI / 2)
    invert = ctx.knob_i("INVERT", 0)
    bar_alias = ctx.knob_f("BAR_ALIAS_FACTOR", 1.2)
    c_alias = ctx.knob_f("C_ALIAS_FACTOR", 1.8)
    off_x = ctx.knob_f("CENTER_OFFSET_X", 0)
    off_y = ctx.knob_f("CENTER_OFFSET_Y", 0)
    bow = ctx.knob_f("BAR_OUTLINE_WIDTH", 0)
    use_alpha = ctx.knob_i("_USE_ALPHA", 1) > 0

    # ---- static polar geometry (radial/1.frag:44-70) -------------------
    x, y = base.frag_coords(w, h, pixel_center_integer=False)
    dx = x[None, :] - (w // 2) + off_x
    dy = y[:, None] - (h // 2) + off_y
    theta = np.arctan2(dy, dx)                    # (H, W)
    dist = np.sqrt(dx * dx + dy * dy)

    ring = (dist > c_radius - c_line / 2.0) & (dist < c_radius + c_line / 2.0)
    ring_alpha = np.clip((c_line / 2.0 - np.abs(c_radius - dist)) * c_alias, 0.0, 1.0)

    section = TWOPI / nbars
    center = section / 2.0
    m = theta - section * np.floor(theta / section)   # GLSL mod
    ym = dist * np.sin(center - m)
    in_bar = (dist > c_radius) & (np.abs(ym) < bar_width / 2.0)

    idx = theta + rotate
    dirv = np.abs(idx) - TWOPI * np.floor(np.abs(idx) / TWOPI)
    idx = np.where(dirv > PI, -np.sign(idx) * (TWOPI - dirv), idx)
    if invert == 0:
        idx = -idx
    pos = (np.abs(idx) / section).astype(np.int64) / float(nbars // 2)
    use_left = idx > 0

    if use_alpha:
        alias = (bar_width / 2.0 - np.abs(ym)) * bar_alias
        bar_d = dist - c_radius
    else:
        alias = np.ones_like(ym)
        bar_d = dist - (c_radius + c_line / 2.0)

    # sample at NBARS/2 + 1 distinct bar positions per channel
    bar_pos = np.arange(nbars // 2 + 1, dtype=np.float64) / float(nbars // 2)
    sample = ctx.sampler(np.clip(bar_pos, 0.0, 1.0))
    bar_id = np.clip(
        (np.abs(idx) / section).astype(np.int64), 0, nbars // 2
    )
    bar_id_c = jnp.asarray(bar_id.astype(np.int32))
    use_left_c = jnp.asarray(use_left)
    in_bar_c = jnp.asarray(in_bar)
    ring_c = jnp.asarray(ring)
    ring_alpha_c = jnp.asarray(ring_alpha.astype(np.float32))
    alias_c = jnp.asarray(alias.astype(np.float32))
    bar_d_c = jnp.asarray(bar_d.astype(np.float32))

    outline_col = base.color_planes(ctx.color_fn("OUTLINE")())
    color_fn = ctx.color_fn("COLOR")
    bar_outline_fn = ctx.color_fn("BAR_OUTLINE")

    # --- packed planes for the fast path (HBM diet) ----------------------
    # TPU gathers over a (H, W) index plane are pathologically slow
    # (~20x the whole raster); the spectrum has only 2*(NBARS/2+1)
    # distinct values, so the per-pixel bar value is materialized with
    # an unrolled select-sum against a single int16 combined id plane
    # (left ids first, right ids offset by n1). in_bar/ring booleans
    # fold into the alias/ring-alpha floats: alias_enc >= 0 iff in_bar
    # (clip(alias) is the AA alpha), f0a = premultiplied ring alpha
    # (0 off-ring). All arithmetic is bit-identical to the reference
    # formulation — only the memory layout changed.
    n1 = nbars // 2 + 1
    comb_id_np = (bar_id + np.where(use_left, 0, n1)).astype(np.int64)
    comb_id = jnp.asarray(comb_id_np.astype(np.int16))
    # on TPU the static sorted-block lookup replaces the unrolled
    # 2*n1-term select-sum: the id plane is static and the table tiny
    # (1-2 chunks), so each block reads just its own window — same
    # values, a fraction of the VPU work
    import jax as _jax

    radial_lk = None
    if _jax.default_backend() == "tpu":
        from glava_tpu.ops.pallas.lookup import build_static_table_lookup

        radial_lk = build_static_table_lookup(comb_id_np, 2 * n1)
    alias_enc = jnp.asarray(
        np.where(
            in_bar, np.clip(alias, 0.0, 1.0), -1.0
        ).astype(np.float32)
    )
    outline_f32 = np.asarray(outline_col, np.float32)
    f0a_c = jnp.asarray(
        np.where(
            ring,
            np.float32(outline_f32[3]) * ring_alpha.astype(np.float32),
            np.float32(0.0),
        ).astype(np.float32)
    )

    def pass1_fast(inputs: base.PassInputs) -> base.Planes:
        """Default-config path (no bar outline, alpha AA, scalar COLOR
        alpha): assemble the frame from per-channel scalar fields with
        no gathers and 3 packed input planes — ~6x less HBM traffic
        than frame blending at 1080p."""
        vl = sample(inputs.textures["audio_l"])
        vr = sample(inputs.textures["audio_r"])
        if radial_lk is not None:
            v = radial_lk(jnp.concatenate([vl, vr]) * amplify)
        else:  # CPU/GPU gathers are fine (bit-identical result)
            v = jnp.where(use_left_c, vl[bar_id_c], vr[bar_id_c]) * amplify
        body = (alias_enc >= 0.0) & (bar_d_c <= v)

        # ring layer as premultiplied scalar fields (constant rgb)
        color = base.color_planes(color_fn(d=bar_d_c))
        ca = color[3] * jnp.maximum(alias_enc, 0.0)
        one_m = 1.0 - jnp.clip(f0a_c, 0.0, 1.0)
        chans = []
        for k in range(3):
            prem = outline_col[k] * f0a_c
            chans.append(jnp.where(body, prem + color[k] * one_m, prem))
        chans.append(jnp.where(body, jnp.maximum(ca, f0a_c), f0a_c))
        return tuple(chans)

    def pass1(inputs: base.PassInputs) -> base.Planes:
        vl = sample(inputs.textures["audio_l"])
        vr = sample(inputs.textures["audio_r"])
        if radial_lk is not None:
            # static id-plane lookup (a (H, W)-indexed gather is ~20x
            # the whole raster on TPU); bit-identical values
            v = radial_lk(jnp.concatenate([vl, vr]) * amplify)
        else:
            # CPU/GPU backends gather fine; the unrolled select-sum
            # would be a large regression there
            v = jnp.where(use_left_c, vl[bar_id_c], vr[bar_id_c]) * amplify

        frag = (jnp.float32(0.0),) * 4
        # center ring (radial/1.frag:49-56)
        ring_col = list(_apply_frag(frag, outline_col, use_alpha))
        if use_alpha:
            ring_col[3] = ring_col[3] * ring_alpha_c
        frag = tuple(
            jnp.where(ring_c, rc, f) for rc, f in zip(ring_col, frag)
        )

        # bars: COLOR / BAR_OUTLINE with d = distance past the circle
        body = in_bar_c & (bar_d_c <= v - bow)
        edge = in_bar_c & (bar_d_c <= v) & ~body if bow > 0 else jnp.zeros_like(body)
        # `return`ed pixels skip the final premultiply blend; ring pixels
        # under a drawn bar were already blended over.
        color = base.color_planes(color_fn(d=bar_d_c))

        def aliased(col):
            return (*col[:3], col[3] * jnp.clip(alias_c, 0.0, 1.0))

        if bow > 0:
            inner = in_bar_c & (jnp.asarray(np.abs(ym)) < (bar_width / 2.0 - bow))
            bar_out = base.color_planes(bar_outline_fn(d=bar_d_c))
            r = [jnp.where(inner, c, bo) for c, bo in zip(color, bar_out)]
        else:
            r = color
        if use_alpha:
            r = aliased(r)
        drawn_body = _apply_frag(frag, r, use_alpha)
        frag2 = tuple(
            jnp.where(body, db, f) for db, f in zip(drawn_body, frag)
        )
        if bow > 0:
            bar_out2 = base.color_planes(bar_outline_fn(d=bar_d_c))
            if use_alpha:
                bar_out2 = aliased(bar_out2)
            drawn_edge = _apply_frag(frag, bar_out2, use_alpha)
            frag2 = tuple(
                jnp.where(edge, de, f2) for de, f2 in zip(drawn_edge, frag2)
            )
        returned = body | edge
        # final: APPLY_FRAG(fragment, transparent) premultiplies leftovers
        final = _apply_frag(frag2, (jnp.float32(0.0),) * 4, use_alpha)
        return tuple(
            jnp.where(returned, f2, fi) for f2, fi in zip(frag2, final)
        )

    passes = [pass1_fast if (bow <= 0 and use_alpha) else pass1]
    if ctx.cfg.premultiply_alpha:
        passes.append(base.premultiply_pass)  # radial/2.frag
    return base.ModuleBuild("radial", passes)
