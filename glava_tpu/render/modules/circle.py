"""`circle` module: radial amplitude ring.

Re-expression of shaders/glava/circle/{1,2,3}.frag. Pass 1 draws a
ring displaced by the smoothed spectrum with slope filling; pass 2 is a
neighborhood smoothing post-effect (gated on C_SMOOTH and alpha); pass
3 premultiplies.

Knobs (shaders/glava/circle.glsl): C_RADIUS, C_LINE, OUTLINE, AMPLIFY,
ROTATE, INVERT, C_FILL, C_SMOOTH.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from glava_tpu.ops import smoothing
from glava_tpu.render import base
from glava_tpu.render.modules import register

TWOPI = 6.28318530718
PI = 3.14159265359


def _position(theta: np.ndarray, rotate: float, invert: int):
    """apply_smooth position math (circle/1.frag:34-42)."""
    idx = theta + rotate
    dirv = np.abs(idx) - TWOPI * np.floor(np.abs(idx) / TWOPI)
    idx = np.where(dirv > PI, -np.sign(idx) * (TWOPI - dirv), idx)
    if invert > 0:
        idx = -idx
    pos = np.abs(idx) / (PI + 0.001)
    return pos, idx > 0


@register("circle")
def build(ctx: base.ModuleContext) -> base.ModuleBuild:
    w, h = ctx.screen
    c_radius = ctx.knob_f("C_RADIUS", 128)
    c_line = ctx.knob_f("C_LINE", 1.5)
    amplify = ctx.knob_f("AMPLIFY", 150)
    rotate = ctx.knob_f("ROTATE", PI / 2)
    invert = ctx.knob_i("INVERT", 0)
    c_fill = ctx.knob_i("C_FILL", 0)
    c_smooth = ctx.knob_i("C_SMOOTH", 1)
    use_alpha = ctx.knob_i("_USE_ALPHA", 1) > 0
    outline = base.color_planes(ctx.color_fn("OUTLINE")())

    # static polar geometry; pixel_center_integer (circle/1.frag:1)
    x, y = base.frag_coords(w, h, pixel_center_integer=True)
    dx = x[None, :] - (w // 2)
    dy = y[:, None] - (h // 2)
    theta = np.arctan2(dy, dx)
    dist = np.sqrt(dx * dx + dy * dy)
    # center pixel (dist 0) is masked out below (d0 < -C_LINE/2); give it
    # a finite adv so the position math stays NaN-free
    with np.errstate(divide="ignore"):
        adv = np.where(dist > 0, (c_line * 0.5) / np.maximum(dist, 1e-6), 0.0)

    pos0, left0 = _position(theta, rotate, invert)
    posp, leftp = _position(theta + adv, rotate, invert)
    posm, leftm = _position(theta - adv, rotate, invert)

    d0 = dist - c_radius
    active = d0 >= -(c_line / 2.0)

    sampler = _per_pixel_sampler(ctx)
    masks = [
        (jnp.asarray(np.clip(p, 0.0, 1.0)), jnp.asarray(l))
        for p, l in ((pos0, left0), (posp, leftp), (posm, leftm))
    ]
    d0_c = jnp.asarray(d0.astype(np.float32))
    active_c = jnp.asarray(active)

    # -- fast texture sampling (TPU): XLA lowers the per-pixel gather
    # tex[i] pathologically (~15 ms per 2M-index gather at 1080p ->
    # ~11 fps); the Pallas lane-shuffle lookup is bit-exact and ~45x
    # faster. Indices are static: i = round(pos*sz) per position, with
    # the channel select folded in (left -> audio_l table half).
    import jax

    sz = ctx.sz
    fast_lookup = None
    if jax.default_backend() == "tpu":
        from glava_tpu.ops.pallas.lookup import build_static_table_lookup

        idx_rows = []
        for p, l in ((pos0, left0), (posp, leftp), (posm, leftm)):
            # f32 arithmetic to match the traced sampler bit-for-bit
            p32 = np.clip(p, 0.0, 1.0).astype(np.float32)
            i = np.clip(np.round(p32 * np.float32(sz)), 0, sz - 1)
            comb = i.astype(np.int64) + np.where(l, 0, sz)
            idx_rows.append(comb)
        # static indices: the sorted-block bucket kernel only selects
        # over each block's own chunk window (polar sampling is
        # spatially coherent) — ~2.5x the dense all-chunk kernel.
        # Per-site (H, W) lookups vs one stacked (3, H*W) kernel is
        # SIZE-GATED like the tap barrier (one-process TPU A/Bs,
        # scripts/exp_circle_split_ab.py, v5e): @1080p split wins
        # 2,117 -> 2,945 fps median (all 3 rounds — the stack's
        # reshape/permutation-constant plumbing costs more than two
        # extra kernel launches, and the interpreter, which issues
        # per-site lookups structurally, was beating this module
        # 1.07-1.59x until it matched); @512x256 the stack wins
        # (5,566 vs 5,489 median and split drew a 1,698 collapse —
        # small planes amortize the plumbing and fuse better
        # stacked). Split iff the plane has >= PREV_MAT_MIN_ELEMS
        # (2^19) elements, the same regime boundary as the barrier
        # and YUV420 gates. GLAVA_TPU_CIRCLE_SPLIT_LK=1/0 forces.
        # Identical values either way (same indices, same table) —
        # pinned bit-exact on TPU.
        import os as _os

        from glava_tpu.render.base import PREV_MAT_MIN_ELEMS

        _sm = _os.environ.get("GLAVA_TPU_CIRCLE_SPLIT_LK", "")
        _split = (_sm == "1" or
                  (_sm != "0" and h * w >= PREV_MAT_MIN_ELEMS))
        if _split:
            _lks = [build_static_table_lookup(r, 2 * sz)
                    for r in idx_rows]
        else:
            _lk = build_static_table_lookup(
                np.stack([r.reshape(-1) for r in idx_rows]), 2 * sz)
        presmooth_op = (None if ctx.cfg.smooth_pass
                        else smoothing.presmooth_op(sz, ctx.smooth_params))

        def fast_lookup(tl, tr):
            if presmooth_op is not None:
                tl, tr = presmooth_op(tl), presmooth_op(tr)
            table = jnp.concatenate([tl, tr])
            if _split:
                return [lk(table) * amplify for lk in _lks]
            vals = _lk(table) * amplify
            return [v.reshape(h, w) for v in vals]

    def draw_mask(inputs: base.PassInputs) -> jnp.ndarray:
        """The (H, W) bool draw predicate of circle/1.frag:44-66."""
        tl, tr = inputs.textures["audio_l"], inputs.textures["audio_r"]

        def smoothv(pos_c, left_c):
            return jnp.where(left_c, sampler(tl, pos_c), sampler(tr, pos_c)) * amplify

        if fast_lookup is not None:
            v, vp, vm = fast_lookup(tl, tr)
            a0 = vp - v
            a1 = vm - v
        else:
            v = smoothv(*masks[0])
            a0 = smoothv(*masks[1]) - v
            a1 = smoothv(*masks[2]) - v
        dmax = jnp.maximum(a0, a1)
        dmin = jnp.minimum(a0, a1)
        d = d0_c - v
        if c_fill > 0:
            bounds = d < (c_line / 2.0)
        else:
            bounds = ((d > -(c_line / 2.0)) & (d < (c_line / 2.0))) | (
                (d <= dmax) & (d >= dmin)
            )
        return active_c & bounds

    def pass1(inputs: base.PassInputs) -> base.Planes:
        mask = draw_mask(inputs)
        return tuple(jnp.where(mask, outline[c], 0.0) for c in range(4))

    smooth_on = c_smooth > 0 and use_alpha
    premult_on = bool(ctx.cfg.premultiply_alpha)

    # -- fused scalar-field chain (default; GLAVA_TPU_CIRCLE_SCALAR=0
    # restores the literal three-pass form). Every circle pass output
    # is the CONSTANT outline color times a scalar field: pass 1 is
    # outline (x) mask, the circle/2.frag neighborhood average of that
    # frame is outline (x) (weighted neighbor count / 8), and
    # premultiply maps channelwise products of the same field — so the
    # whole chain runs on ONE (H, W) plane instead of four, and only
    # the final RGBA materializes. Within 1 ulp of the general path
    # (the per-channel partial-sum rounding of _smooth_pass is
    # replaced by one scalar sum; tests pin atol=2e-6).
    import os

    use_scalar = os.environ.get("GLAVA_TPU_CIRCLE_SCALAR", "1") != "0"
    # inter-pass stage FBOs clamp to [0, 1] (base.ModuleBuild.render);
    # fold the clamp into the static color once
    o_cl = np.clip(np.asarray(outline, np.float32), 0.0, 1.0)

    def pass_fused(inputs: base.PassInputs) -> base.Planes:
        mask = draw_mask(inputs)
        m = mask.astype(jnp.float32)
        coef = m
        if smooth_on:
            # tap_source: materialize the mask field once; the six
            # shifted windows below slice it instead of each
            # re-deriving draw_mask (3 table lookups) per fusion
            m = base.tap_source(m)
            p = jnp.pad(m, ((1, 1), (1, 1)))

            def sh(dy, dx):
                return p[1 + dy: 1 + dy + h, 1 + dx: 1 + dx + w]

            wsum = (
                2.0 * sh(0, 1) + sh(1, 1) + sh(1, 0) + 2.0 * sh(0, -1)
                + sh(-1, -1) + sh(-1, 0)
            ) / 8.0
            # circle/2.frag replaces pixels whose alpha is 0; with a
            # zero-alpha outline every pixel qualifies. m > 0 is the
            # mask read off the barrier'd field (m ∈ {0, 1}), so this
            # select doesn't re-derive draw_mask either.
            coef = wsum if o_cl[3] == 0.0 else jnp.where(m > 0, 1.0, wsum)
        if premult_on:
            a = o_cl[3] * coef
            return ((o_cl[0] * coef) * a, (o_cl[1] * coef) * a,
                    (o_cl[2] * coef) * a, a)
        return tuple(o_cl[c] * coef for c in range(4))

    if use_scalar:
        return base.ModuleBuild("circle", [pass_fused])

    passes = [pass1]
    if smooth_on:
        passes.append(_smooth_pass)  # circle/2.frag
    if premult_on:
        passes.append(base.premultiply_pass)  # circle/3.frag
    return base.ModuleBuild("circle", passes)


def _per_pixel_sampler(ctx: base.ModuleContext):
    """smooth_audio at traced per-pixel positions.

    With the default smooth pass the fetch is exact
    (tex[round(pos*sz)], smooth.glsl:62). Without it, we approximate
    the direct kernel by sampling the presmoothed texture — output
    positions differ from texel centers by < 1/sz (documented
    deviation; the reference default has smooth_pass enabled).
    """
    import jax.core

    from glava_tpu.config.glsl_shader import _fetch_1d

    sz = ctx.sz

    def indices(pos):
        """Texel indices for `pos`, keeping CONCRETE positions numpy.

        Matches the traced path bitwise: f32 multiply, round-half-to-
        even, int cast (clip happens in _fetch_1d either way)."""
        if isinstance(pos, (np.ndarray, np.generic, int, float)):
            p32 = np.asarray(pos).astype(np.float32)
            return np.round(p32 * np.float32(sz)).astype(np.int32)
        return jnp.round(pos * sz).astype(jnp.int32)

    def sample(tex, i):
        """tex[i] exploiting index-plane structure when concrete: an
        axis-constant (H, W) plane (bars/graph sample by column only)
        fetches ONE axis of points and broadcasts — ~1000x less lookup
        work than the full-plane path."""
        if isinstance(i, np.ndarray) and i.ndim == 2:
            h2, w2 = i.shape
            if np.array_equal(i, np.broadcast_to(i[0:1, :], i.shape)):
                row = _fetch_1d(tex, jnp.asarray(i[0]), sz)
                return jnp.broadcast_to(row[None, :], (h2, w2))
            if np.array_equal(i, np.broadcast_to(i[:, 0:1], i.shape)):
                col = _fetch_1d(tex, jnp.asarray(i[:, 0]), sz)
                return jnp.broadcast_to(col[:, None], (h2, w2))
            if i.size >= (1 << 16):
                from glava_tpu.config.glsl_shader import (
                    _lazy_allowed, _lazy_fetch,
                )

                if _lazy_allowed():
                    # DEFERRED full-plane fetch: masked assignments of
                    # two lazy fetches (the `if (idx > 0) v =
                    # smooth_f(audio_l); else v = smooth_f(audio_r);`
                    # idiom, radial/1.frag:74-75) merge on the numpy
                    # index plane into ONE combined-table Pallas
                    # lookup at flush — the shape the native modules
                    # build by hand
                    return _lazy_fetch(tex, i, sz)
        # keep CONCRETE planes numpy: _fetch_1d routes them through the
        # static sorted-block lookup (coherence-exploiting)
        return _fetch_1d(tex, i, sz)

    if ctx.cfg.smooth_pass:
        def fetch(tex, pos):
            return sample(tex, indices(pos))
        return fetch
    op = smoothing.presmooth_op(sz, ctx.smooth_params)

    def fetch(tex, pos):
        return sample(op(tex), indices(pos))

    return fetch


def _smooth_pass(inputs: base.PassInputs) -> base.Planes:
    """circle/2.frag: fill fully-transparent pixels with the 8-neighbor
    average (duplicated +-x fetches, like the other outline passes)."""
    frame = tuple(base.tap_source(ch) for ch in inputs.prev)
    mask = frame[3] == 0
    out = []
    for ch in frame:
        h, w = ch.shape
        p = jnp.pad(ch, ((1, 1), (1, 1)))

        def sh(dy, dx):
            return p[1 + dy : 1 + dy + h, 1 + dx : 1 + dx + w]

        avg = (
            2.0 * sh(0, 1) + sh(1, 1) + sh(1, 0) + 2.0 * sh(0, -1)
            + sh(-1, -1) + sh(-1, 0)
        ) / 8.0
        out.append(jnp.where(mask, avg, ch))
    return tuple(out)
