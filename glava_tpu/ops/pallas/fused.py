"""Fused spectrum-update kernel: FFT + magnitude + gravity + average.

The TPU-native successor to the reference's GL-compute FFT library and
post-FFT fragment passes (glfft/glfft.cpp; render.c:2188-2273): one
VMEM-resident kernel per batch tile performs

    four-step packed FFT (MXU matmuls)
    -> log-magnitude + frequency boost        (VPU)
    -> gravity peak-hold decay, state aliased in-place
    -> N-frame weighted average over a rolling history, aliased

so the (batch, bins) working set makes exactly one HBM round trip per
update instead of one per stage. Data layout notes:

* the complex planes stay separate (re, im) end-to-end — the
  reference's interleaved ``four1`` layout is reconstructed by a single
  XLA interleave after the kernel (minor-dim shuffles are hostile to
  the TPU vector layout);
* windowing + packed-pair split happen outside the kernel where XLA
  fuses them into the HBM read;
* the history is a rolling ring indexed by a scalar-prefetched slot —
  valid because every averaging window the reference uses is symmetric
  in frame age (util/common.glsl:13-15), so weight-by-slot equals
  weight-by-age.

State dtype is float32 and results match the unfused path to ~1e-6
(texture clamp semantics included).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from glava_tpu.ops.fft import _dft_matrix, _split
from glava_tpu.ops import windows as win


def _pallas_split(m: int) -> tuple[int, int]:
    """m = m1 * m2 with m1 = 128: the final (k2, k1) -> flat collapse
    is lane-aligned (Mosaic only supports minor-dim reshapes at the
    128-lane width), and the stage-1 DFT matmul is a full 128x128 MXU
    tile."""
    if m % 128 == 0 and m >= 256:
        return 128, m // 128
    return _split(m)


def _constants(n: int):
    m = n // 2
    m1, m2 = _pallas_split(m)
    w1r, w1i = _dft_matrix(m1)
    w2r, w2i = _dft_matrix(m2)
    k1 = np.arange(m1)[:, None]
    n2 = np.arange(m2)[None, :]
    ang = -2.0 * np.pi * k1 * n2 / m
    # twiddles transposed to (n2, k1) to match the (B, m2, m1) layout
    tr = np.cos(ang).T.astype(np.float32).copy()
    ti = np.sin(ang).T.astype(np.float32).copy()
    j = np.arange(n, dtype=np.float32) / n
    boost_re = j[0::2].copy()  # boost base for even (re) floats
    boost_im = j[1::2].copy()
    return m, m1, m2, w1r, w1i, w2r, w2i, tr, ti, boost_re, boost_im


@lru_cache(maxsize=None)
def build_fused_update(
    n: int,
    frames: int,
    avg_weights: tuple[float, ...],
    batch_tile: int = 16,
    texture_clamp: bool = True,
    interpret: bool = False,
    fast_math: bool = False,
):
    """Compile the fused update for ``n``-float buffers.

    Returns ``fn(pcm, grav, hist, slot, fft_scale, fft_cutoff, g) ->
    (avg, grav', hist')`` over planes layout:

    * pcm   (B, n)        raw ring snapshots (not windowed)
    * grav  (B, 2, m)     gravity store planes, donated
    * hist  (B, F, 2, m)  rolling average history, donated
    * slot  int32         history slot to overwrite (update_count % F)
    * avg   (B, 2, m)     averaged spectrum planes

    Use :func:`interleave_planes` to recover the reference layout.
    """
    (m, m1, m2, w1r, w1i, w2r, w2i, tr, ti, boost_re, boost_im) = _constants(n)
    F = frames
    wts = tuple(float(w) for w in avg_weights)
    assert len(wts) == F
    window = win.pcm_window(n)
    # fast_math trades exact f32 FFT matmuls for single-pass bf16 MXU
    # (visually indistinguishable spectra; opt-in via
    # GLAVA_TPU_FAST_MATH=1 — see docs/ARCHITECTURE.md)
    _prec = (jax.lax.Precision.DEFAULT if fast_math
             else jax.lax.Precision.HIGHEST)

    def kernel(slot_ref, scale_ref, cutoff_ref, g_ref,
               ar_ref, ai_ref, grav_ref, hist_ref,
               avg_ref, grav_out, hist_out,
               w1r_ref, w1i_ref, w2r_ref, w2i_ref, tr_ref, ti_ref,
               bre_ref, bim_ref):
        B = ar_ref.shape[0]
        # ---- four-step FFT over (B, m1, m2) planes -------------------
        ar = ar_ref[:]
        ai = ai_ref[:]

        def stage1(xr, xi):
            # contract n1: lhs (B, m1, m2) axis 1 with W1 axis 1 -> (B, m2, k1)
            rr = jax.lax.dot_general(
                xr, w1r_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            ) - jax.lax.dot_general(
                xi, w1i_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            )
            ri = jax.lax.dot_general(
                xi, w1r_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            ) + jax.lax.dot_general(
                xr, w1i_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            )
            return rr, ri  # (B, m2, m1) == (B, n2, k1)

        br, bi = stage1(ar, ai)
        # twiddle (n2, k1)
        cr = br * tr_ref[:] - bi * ti_ref[:]
        ci = br * ti_ref[:] + bi * tr_ref[:]

        def stage2(xr, xi):
            # contract n2: lhs (B, n2, k1) axis 1 with W2 axis 1 -> (B, k1, k2)
            rr = jax.lax.dot_general(
                xr, w2r_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            ) - jax.lax.dot_general(
                xi, w2i_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            )
            ri = jax.lax.dot_general(
                xi, w2r_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            ) + jax.lax.dot_general(
                xr, w2i_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=_prec,
            )
            return rr, ri  # (B, k1, k2)

        dr, di = stage2(cr, ci)
        # X[k1 + m1*k2]: flatten (k2, k1) row-major
        xr = dr.swapaxes(1, 2).reshape(B, m)
        xi = di.swapaxes(1, 2).reshape(B, m)

        # ---- magnitude + boost (render.c:841-846) --------------------
        fs = scale_ref[:]   # (B, 1, 1) per-row scalars
        fc = cutoff_ref[:]
        mr = jnp.log(jnp.abs(xr) + 1.0) / 3.0
        mi = jnp.log(jnp.abs(xi) + 1.0) / 3.0
        fs2 = fs[:, 0]      # (B, 1) broadcast against (B, m)
        fc2 = fc[:, 0]
        mr = mr * jnp.maximum(bre_ref[:] * fs2 + (1.0 - fc2), 1.0)
        mi = mi * jnp.maximum(bim_ref[:] * fs2 + (1.0 - fc2), 1.0)
        spec = jnp.stack([mr, mi], axis=1)  # (B, 2, m)
        if texture_clamp:
            spec = jnp.clip(spec, 0.0, 1.0)

        # ---- gravity (render.c:720-736 / 2199-2228) ------------------
        g = g_ref[:]        # (B, 1, 1)
        grav = jnp.maximum(grav_ref[:], spec) - g
        if texture_clamp:
            grav = jnp.clip(grav, 0.0, 1.0)
        grav_out[:] = grav

        # ---- rolling-history average (render.c:738-771) --------------
        slot = slot_ref[0]
        hist_out[:] = hist_ref[:]
        hist_out[:, pl.ds(slot, 1)] = grav[:, None]
        acc = jnp.zeros((B, 2, m), jnp.float32)
        for f in range(F):
            acc = acc + wts[f] * hist_out[:, f]
        if texture_clamp:
            acc = jnp.clip(acc, 0.0, 1.0)
        avg_ref[:] = acc

    def fn(pcm, grav, hist, slot, fft_scale, fft_cutoff, g):
        Btot = pcm.shape[0]
        bt = min(batch_tile, Btot)
        if Btot % bt:
            raise ValueError(f"batch {Btot} not divisible by tile {bt}")
        # window + packed split, fused by XLA into the kernel feed
        x = pcm * jnp.asarray(window)
        ar = x[..., 0::2].reshape(Btot, m1, m2)
        ai = x[..., 1::2].reshape(Btot, m1, m2)

        grid = (Btot // bt,)
        vm = pltpu.VMEM
        bspec = lambda blk, imap: pl.BlockSpec(blk, imap, memory_space=vm)
        const = lambda shp: pl.BlockSpec(
            shp, lambda i, *_: (0,) * len(shp), memory_space=vm
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,  # slot
            grid=grid,
            in_specs=[
                bspec((bt, 1, 1), lambda i, *_: (i, 0, 0)),
                bspec((bt, 1, 1), lambda i, *_: (i, 0, 0)),
                bspec((bt, 1, 1), lambda i, *_: (i, 0, 0)),
                bspec((bt, m1, m2), lambda i, *_: (i, 0, 0)),
                bspec((bt, m1, m2), lambda i, *_: (i, 0, 0)),
                bspec((bt, 2, m), lambda i, *_: (i, 0, 0)),
                bspec((bt, F, 2, m), lambda i, *_: (i, 0, 0, 0)),
                const((m1, m1)),
                const((m1, m1)),
                const((m2, m2)),
                const((m2, m2)),
                const((m2, m1)),
                const((m2, m1)),
                const((m,)),
                const((m,)),
            ],
            out_specs=[
                bspec((bt, 2, m), lambda i, *_: (i, 0, 0)),
                bspec((bt, 2, m), lambda i, *_: (i, 0, 0)),
                bspec((bt, F, 2, m), lambda i, *_: (i, 0, 0, 0)),
            ],
        )

        def reordered_kernel(slot_ref, scale_ref, cutoff_ref, g_ref,
                             ar_ref, ai_ref, grav_ref, hist_ref,
                             w1r_ref, w1i_ref, w2r_ref, w2i_ref,
                             tr_ref, ti_ref, bre_ref, bim_ref,
                             avg_ref, grav_out, hist_out):
            kernel(slot_ref, scale_ref, cutoff_ref, g_ref,
                   ar_ref, ai_ref, grav_ref, hist_ref,
                   avg_ref, grav_out, hist_out,
                   w1r_ref, w1i_ref, w2r_ref, w2i_ref, tr_ref, ti_ref,
                   bre_ref, bim_ref)

        flops = Btot * (8 * m * (m1 + m2)) + Btot * 2 * m * (F + 8)
        avg, grav2, hist2 = pl.pallas_call(
            reordered_kernel,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Btot, 2, m), jnp.float32),
                jax.ShapeDtypeStruct((Btot, 2, m), jnp.float32),
                jax.ShapeDtypeStruct((Btot, F, 2, m), jnp.float32),
            ],
            input_output_aliases={6: 1, 7: 2},
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=4 * Btot * (n + 2 * m + 2 * 2 * m * F + 2 * m),
                transcendentals=Btot * n,
            ),
            interpret=interpret,
        )(
            jnp.asarray([slot], jnp.int32),
            _rowvec(fft_scale, Btot),
            _rowvec(fft_cutoff, Btot),
            _rowvec(g, Btot),
            ar, ai, grav, hist,
            w1r, w1i, w2r, w2i, tr, ti, boost_re, boost_im,
        )
        return avg, grav2, hist2

    return fn


def _rowvec(v, B: int) -> jnp.ndarray:
    """Scalar or (B,) per-row parameter -> (B, 1, 1) f32 kernel input."""
    arr = jnp.asarray(v, jnp.float32)
    if arr.ndim == 0:
        arr = jnp.broadcast_to(arr, (B,))
    return arr.reshape(B, 1, 1)


def interleave_planes(planes: jax.Array) -> jax.Array:
    """(B, 2, m) planes -> (B, 2m) reference interleaved layout."""
    B, _, m = planes.shape
    return jnp.stack([planes[:, 0], planes[:, 1]], axis=-1).reshape(B, 2 * m)


def split_planes(inter: jax.Array) -> jax.Array:
    """(B, 2m) interleaved -> (B, 2, m) planes."""
    B, n = inter.shape
    return jnp.stack([inter[:, 0::2], inter[:, 1::2]], axis=1)
