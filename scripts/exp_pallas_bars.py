"""Experiment: bars raster as a Pallas kernel vs the XLA lowering.

VERDICT r3 #9 / BASELINE config #3 ask whether a hand-written Pallas
raster can beat XLA's fused masked-select rasterization — the update
chain already answered "no" for the DSP path (XLA 91 us vs Pallas
174 us, wisdom `path` record); this closes the rasterization half of
the claim with a measured number either way.

The experiment isolates the *raster* stage of bars/1.frag:50-118 (see
render/modules/bars.py for the shipped lowering): given the per-column
sampled+amplified value ``v`` (gap/out-of-bounds columns folded to
-inf), the per-column inner-bar mask, and the per-row gradient colors,
produce the (H, W, 4) RGBA frame:

    body = d < v - BAR_OUTLINE_WIDTH      (fill region)
    edge = d <= v                          (fill + outline cap)
    out  = body & inner ? color(d)
         : (edge & ~body) | (body & ~inner) ? outline(d)
         : 0

Both lowerings share identical inputs and are asserted bit-exact; the
honest protocol (scan-amortized, fresh v per iteration, scalar probe,
two-point slope) gives us/frame for each. Results land in
docs/STATUS.md's experiments table.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_pallas_bars.py
"""

from __future__ import annotations

import sys

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.utils.timing import probed_slope

W, H = 1920, 1080
BOW = 1.0                      # BAR_OUTLINE_WIDTH default (bars.glsl:10)

# padded raster grid: H -> 1088 = 8 * 136 sublane-aligned rows,
# W = 1920 = 5 * 384 lanes
HP, BH = 1088, 136
BW = 384


def make_inputs(seed: int = 0):
    """Column/row precomputations for default bars knobs @1080p
    (the same numpy math render/modules/bars.py bakes)."""
    rng = np.random.default_rng(seed)
    bw_k, gap = 5.0, 1.0
    section = bw_k + gap
    center = section / 2.0
    ax = np.arange(W, dtype=np.float64) + 0.5
    dx = ax - (W // 2)
    m = np.abs(dx - section * np.floor(dx / section))
    md = m - center
    in_bar = (md < np.ceil(bw_k / 2)) & (md >= -np.floor(bw_k / 2))
    inner = (md < np.ceil(bw_k / 2) - BOW) & (md >= -np.floor(bw_k / 2) + BOW)
    nbars = np.floor((W * 0.5) / section) * 2.0
    s = dx / section
    p = np.where(s > 0, np.ceil(s), np.floor(s)) / (nbars / 2.0)
    p = p + np.sign(p) * ((0.5 + center) / W)
    visible = in_bar & ~((p > 1) | (p < -1))

    # per-column sampled value stands in for the spectrum gather —
    # the experiment measures the raster, not the sampler
    v0 = (np.abs(rng.standard_normal(W)) * 60.0).astype(np.float32)
    v0 = np.where(visible, v0, -np.inf).astype(np.float32)

    d = (np.arange(H, dtype=np.float32) + 0.5)
    # COLOR = mix(#3366b2, #a0a0b2, clamp(d / GRADIENT, 0, 1)) (bars.glsl:18)
    t = np.clip(d / 80.0, 0.0, 1.0)[:, None]
    c0 = np.array([0x33, 0x66, 0xB2], np.float32) / 255.0
    c1 = np.array([0xA0, 0xA0, 0xB2], np.float32) / 255.0
    color = np.concatenate([c0 + (c1 - c0) * t,
                            np.ones((H, 1), np.float32)], axis=1)
    # BAR_OUTLINE = vec4(COLOR.rgb * 1.5, COLOR.a) (bars.glsl:20),
    # unclamped — quantization clamps later, as in the shipped path
    outline = np.concatenate([color[:, :3] * 1.5, color[:, 3:]], axis=1)
    return (jnp.asarray(v0), jnp.asarray(inner & visible),
            jnp.asarray(d), jnp.asarray(color.astype(np.float32)),
            jnp.asarray(outline.astype(np.float32)))


# ---------------------------------------------------------------------------
# XLA lowering (the shipped shape, bars.py pass1)
# ---------------------------------------------------------------------------

def xla_raster(v, inner, d, color, outline):
    d_col = d[:, None]
    body = d_col < (v - BOW)[None, :]
    edge = d_col <= v[None, :]
    out = jnp.zeros((H, W, 4), jnp.float32)
    out = jnp.where((edge & ~body)[..., None], outline[:, None, :], out)
    out = jnp.where((body & ~inner[None, :])[..., None],
                    outline[:, None, :], out)
    out = jnp.where((body & inner[None, :])[..., None],
                    color[:, None, :], out)
    return out


# ---------------------------------------------------------------------------
# Pallas lowering: 4 channel planes, (BH, BW) VMEM blocks
# ---------------------------------------------------------------------------

def _kernel(v_ref, inner_ref, d_ref, col_ref, out_ref):
    v = v_ref[...]                    # (1, BW)
    inner = inner_ref[...]            # (1, BW) f32 0/1
    d = d_ref[...]                    # (BH, 1)
    body = d < (v - BOW)
    edge = d <= v
    # col_ref is (BH, 2): [:, 0] = color_c, [:, 1] = outline_c
    c = col_ref[:, 0][:, None]
    o = col_ref[:, 1][:, None]
    inner_b = inner > 0.5
    fill = jnp.logical_and(body, inner_b)
    line = jnp.logical_or(jnp.logical_and(edge, jnp.logical_not(body)),
                          jnp.logical_and(body, jnp.logical_not(inner_b)))
    out_ref[...] = jnp.where(fill, c, jnp.where(line, o, 0.0))


def pallas_raster(v, inner, d, color, outline):
    innerf = inner.astype(jnp.float32)[None, :]
    vp = v[None, :]
    dpad = jnp.pad(d, (0, HP - H), constant_values=jnp.inf)[:, None]
    planes = []
    for chan in range(4):
        colpair = jnp.stack(
            [jnp.pad(color[:, chan], (0, HP - H)),
             jnp.pad(outline[:, chan], (0, HP - H))], axis=1)  # (HP, 2)
        plane = pl.pallas_call(
            _kernel,
            grid=(HP // BH, W // BW),
            in_specs=[
                pl.BlockSpec((1, BW), lambda i, j: (0, j)),
                pl.BlockSpec((1, BW), lambda i, j: (0, j)),
                pl.BlockSpec((BH, 1), lambda i, j: (i, 0)),
                pl.BlockSpec((BH, 2), lambda i, j: (i, 0)),
            ],
            out_specs=pl.BlockSpec((BH, BW), lambda i, j: (i, j)),
            out_shape=jax.ShapeDtypeStruct((HP, W), jnp.float32),
        )(vp, innerf, dpad, colpair)
        planes.append(plane[:H])
    return jnp.stack(planes, axis=-1)


def measure(fn, v, inner, d, color, outline, K=32):
    def many(v):
        def body(acc, k):
            out = fn(v * (1.0 + 1e-3 * k), inner, d, color, outline)
            return acc + out.sum(), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(K, dtype=jnp.float32))
        return acc

    f = jax.jit(many)
    float(f(v))
    return probed_slope(lambda: f(v), 3, 9) / K


def main():
    _enable_compile_cache()
    v, inner, d, color, outline = make_inputs()
    a = np.asarray(jax.jit(xla_raster)(v, inner, d, color, outline))
    b = np.asarray(jax.jit(pallas_raster)(v, inner, d, color, outline))
    if not np.array_equal(a, b):
        bad = np.argwhere(a != b)
        print(f"MISMATCH at {bad[:4]}: {a[tuple(bad[0])]} vs "
              f"{b[tuple(bad[0])]}", file=sys.stderr)
        raise SystemExit(1)
    print("bit-exact: ok")
    tx = measure(xla_raster, v, inner, d, color, outline)
    tp = measure(pallas_raster, v, inner, d, color, outline)
    print(f"XLA raster    @1080p: {tx*1e6:8.1f} us/frame "
          f"({1/tx:,.0f} fps)")
    print(f"Pallas raster @1080p: {tp*1e6:8.1f} us/frame "
          f"({1/tp:,.0f} fps)")
    print(f"verdict: {'Pallas' if tp < tx else 'XLA'} wins "
          f"({max(tx, tp)/min(tx, tp):.2f}x)")


if __name__ == "__main__":
    main()
