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
* the history is a rolling ring with PER-ROW slot counters and
  **age-mapped** weights: the reference binds its averaging FBOs
  newest-first (render.c:2252-2256), i.e. weights follow frame age.
  (The round-1 weight-by-slot shortcut was only exact in steady state
  — window symmetry does not make slot order equal age order.)

State dtype is float32 and results match the unfused path to ~1e-6
(texture clamp semantics included).

Status note (round 2): with honest timing (scalar-probe completion;
`jax.block_until_ready` can return early on the axon runtime), the
plain XLA transform chain outperforms these kernels ~2x at the shipped
sizes — XLA schedules the FFT matmuls across the full batch while a
Pallas grid serializes VMEM-sized tiles. The kernels remain available
via ``GLAVA_TPU_FUSED=1`` and are numerically pinned by tests; the
pipeline default is the XLA path (pipeline.py).
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


def _age_weights(avg_weights, frames: int) -> tuple:
    """Averaging weights in AGE order for the ring kernels.

    ``avg_weights`` arrive POSITIONAL oldest-first (windows.avg_weights
    convention, = avg_apply's history axis); the kernels' ring math
    indexes weights by AGE (``w[(slot - s) mod F]``, age 0 = newest),
    so reverse. With the true asymmetric (shifted-macro) curves the
    order is observable — symmetric transcriptions used to mask it.
    Single source of truth for every fused builder."""
    wts = tuple(float(w) for w in avg_weights)[::-1]
    assert len(wts) == frames
    return wts


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
    wts = _age_weights(avg_weights, F)
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
        # age-mapped weights: ring slot f holds the frame of age
        # (slot - f) mod F; the reference weights by AGE (its averaging
        # shader binds circular FBOs newest-first, render.c:2252-2256)
        acc = jnp.zeros((B, 2, m), jnp.float32)
        for f in range(F):
            w_f = jnp.float32(0.0)
            for a in range(F):
                w_f = jnp.where(slot == (a + f) % F, jnp.float32(wts[a]), w_f)
            acc = acc + w_f * hist_out[:, f]
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


@lru_cache(maxsize=None)
def build_fused_update_ring(
    n: int,
    frames: int,
    avg_weights: tuple[float, ...],
    batch_tile: int = 16,
    texture_clamp: bool = True,
    fast_math: bool = False,
    interpret: bool = False,
):
    """Fully-vectorized ring-history fused update (ALTERNATIVE form;
    the opt-in Pallas path used by the pipeline is
    :func:`build_fused_update_inc`, which measured slightly faster —
    and the default update path is the plain XLA chain, see
    pipeline.py).

    Same semantics and interface as :func:`build_fused_update_inc`
    (per-row ring slots, **age-mapped** weights — the reference binds
    its averaging FBOs newest-first, render.c:2252-2256), but the
    history streams through VMEM as ordinary pipelined blocks instead
    of manual per-row DMAs: the slot write is a masked select per
    frame plane and the age rotation is a vectorized compare against a
    (B, 1, 1) slot input. No scalar loops, no DMA latency chains —
    Mosaic double-buffers the history stream and overlaps it with the
    FFT matmuls.

    Interface: ``fn(pcm, grav, hist, sum, slot, fft_scale, fft_cutoff,
    g) -> (grav', hist', sum')`` — ``sum`` is only an aliasing donor.
    """
    (m, m1, m2, w1r, w1i, w2r, w2i, tr, ti, boost_re, boost_im) = _constants(n)
    F = frames
    wts = _age_weights(avg_weights, F)
    window = win.pcm_window(n)
    _prec = (jax.lax.Precision.DEFAULT if fast_math
             else jax.lax.Precision.HIGHEST)

    def kernel(slotv_ref, scale_ref, cutoff_ref, g_ref,
               ar_ref, ai_ref, grav_ref, hist_ref,
               w1r_ref, w1i_ref, w2r_ref, w2i_ref, tr_ref, ti_ref,
               bre_ref, bim_ref,
               avg_ref, grav_out, hist_out):
        B = ar_ref.shape[0]

        def dg(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_prec,
            )

        ar, ai = ar_ref[:], ai_ref[:]
        # stage 1 on the MXU: contraction K = m1 = 128, full tiles
        br = dg(ar, w1r_ref[:]) - dg(ai, w1i_ref[:])
        bi = dg(ai, w1r_ref[:]) + dg(ar, w1i_ref[:])
        cr = br * tr_ref[:] - bi * ti_ref[:]
        ci = br * ti_ref[:] + bi * tr_ref[:]
        # stage 2 on the VPU: a K=N=m2 (16 for the shipped bufsize)
        # matmul runs the MXU at ~1.5% utilization and dominated the
        # kernel; instead unroll the m2-point DFT as scalar-constant
        # FMAs over (B, k1) lane-aligned planes. The DFT matrix entries
        # are compile-time immediates.
        w2r_c = np.cos(
            -2.0 * np.pi
            * np.outer(np.arange(m2), np.arange(m2)) / m2
        )
        w2i_c = np.sin(
            -2.0 * np.pi
            * np.outer(np.arange(m2), np.arange(m2)) / m2
        )
        rows_r = []
        rows_i = []
        for k2 in range(m2):
            acc_r = jnp.zeros((B, 1, m1), jnp.float32)
            acc_i = jnp.zeros((B, 1, m1), jnp.float32)
            for n2 in range(m2):
                wr = float(w2r_c[n2, k2])
                wi = float(w2i_c[n2, k2])
                crn = cr[:, n2:n2 + 1, :]
                cin = ci[:, n2:n2 + 1, :]
                acc_r = acc_r + wr * crn - wi * cin
                acc_i = acc_i + wi * crn + wr * cin
            rows_r.append(acc_r)
            rows_i.append(acc_i)
        # X[k1 + m1*k2]: (B, k2, k1) with k1 minor = lane-aligned
        xr = jnp.concatenate(rows_r, axis=1).reshape(B, m)
        xi = jnp.concatenate(rows_i, axis=1).reshape(B, m)
        fs2 = scale_ref[:][:, 0]
        fc2 = cutoff_ref[:][:, 0]
        mr = jnp.log(jnp.abs(xr) + 1.0) / 3.0
        mi = jnp.log(jnp.abs(xi) + 1.0) / 3.0
        mr = mr * jnp.maximum(bre_ref[:] * fs2 + (1.0 - fc2), 1.0)
        mi = mi * jnp.maximum(bim_ref[:] * fs2 + (1.0 - fc2), 1.0)
        spec = jnp.stack([mr, mi], axis=1)
        if texture_clamp:
            spec = jnp.clip(spec, 0.0, 1.0)

        grav = jnp.maximum(grav_ref[:], spec) - g_ref[:]
        if texture_clamp:
            grav = jnp.clip(grav, 0.0, 1.0)
        grav_out[:] = grav

        slotv = slotv_ref[:]  # (B, 1, 1) f32 per-row ring slot
        acc = jnp.zeros((B, 2, m), jnp.float32)
        for f in range(F):
            new_f = jnp.where(slotv == float(f), grav, hist_ref[:, f])
            hist_out[:, f] = new_f
            # age of slot f is (slot - f) mod F; weight-by-age
            w_f = jnp.zeros((B, 1, 1), jnp.float32)
            for a in range(F):
                w_f = jnp.where(slotv == float((a + f) % F),
                                jnp.float32(wts[a]), w_f)
            acc = acc + w_f * new_f
        avg_ref[:] = acc

    def fn(pcm, grav, hist, ssum, slot, fft_scale, fft_cutoff, g):
        Btot = pcm.shape[0]
        bt = min(batch_tile, Btot)
        while Btot % bt:
            bt //= 2
        x = pcm * jnp.asarray(window)
        ar = x[..., 0::2].reshape(Btot, m1, m2)
        ai = x[..., 1::2].reshape(Btot, m1, m2)
        grid = (Btot // bt,)
        vm = pltpu.VMEM
        bspec = lambda blk, imap: pl.BlockSpec(blk, imap, memory_space=vm)
        const = lambda shp: pl.BlockSpec(
            shp, lambda i: (0,) * len(shp), memory_space=vm
        )
        avg, grav2, hist2 = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                bspec((bt, 1, 1), lambda i: (i, 0, 0)),
                bspec((bt, 1, 1), lambda i: (i, 0, 0)),
                bspec((bt, 1, 1), lambda i: (i, 0, 0)),
                bspec((bt, 1, 1), lambda i: (i, 0, 0)),
                bspec((bt, m1, m2), lambda i: (i, 0, 0)),
                bspec((bt, m1, m2), lambda i: (i, 0, 0)),
                bspec((bt, 2, m), lambda i: (i, 0, 0)),
                bspec((bt, F, 2, m), lambda i: (i, 0, 0, 0)),
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
                bspec((bt, 2, m), lambda i: (i, 0, 0)),
                bspec((bt, 2, m), lambda i: (i, 0, 0)),
                bspec((bt, F, 2, m), lambda i: (i, 0, 0, 0)),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((Btot, 2, m), jnp.float32),
                jax.ShapeDtypeStruct((Btot, 2, m), jnp.float32),
                jax.ShapeDtypeStruct((Btot, F, 2, m), jnp.float32),
            ],
            # no input_output_aliases: every output plane is fully
            # written, and inside lax.scan aliasing would force XLA to
            # copy the (B, F, 2, m) history every iteration to satisfy
            # in-place semantics against ping-ponged loop buffers
            cost_estimate=pl.CostEstimate(
                flops=Btot * (8 * m * (m1 + m2) + 2 * m * F),
                bytes_accessed=4 * Btot * (n + 4 * m * F + 8 * m),
                transcendentals=Btot * n,
            ),
            interpret=interpret,
        )(
            _slotvec(slot, Btot).astype(jnp.float32).reshape(Btot, 1, 1),
            _rowvec(fft_scale, Btot),
            _rowvec(fft_cutoff, Btot),
            _rowvec(g, Btot),
            ar, ai, grav, hist,
            w1r, w1i, w2r, w2i, tr, ti, boost_re, boost_im,
        )
        return grav2, hist2, avg

    return fn


@lru_cache(maxsize=None)
def build_fused_update_inc(
    n: int,
    frames: int,
    avg_weights: tuple[float, ...],
    batch_tile: int = 8,
    texture_clamp: bool = True,
    fast_math: bool = False,
    interpret: bool = False,
    megacore: bool = False,
):
    """Ring-history variant of the fused update (the kernel the
    pipeline uses when the opt-in Pallas path is selected via
    GLAVA_TPU_FUSED=1; the default update path is the XLA chain).

    The v1 kernel streams the whole (B, F, 2, m) history through VMEM
    in AND out every update (~4F planes of HBM traffic) even though
    only one slot changes. Here the history stays HBM-resident
    (memory_space=ANY): each row's full ring is DMA-read once (F
    planes), the new frame overwrites that row's slot both in VMEM and
    via a one-slot DMA write-back (1 plane), and the averaged texture
    is recomputed exactly with **age-mapped** weights:

        tex = sum_s w[(slot - s) mod F] * hist[s]

    The age rotation matters: the reference's averaging shader binds
    its circular FBOs newest-first ("t0 is the most recent",
    render.c:2252-2256), i.e. the window weight follows frame AGE, not
    ring slot. A slot-indexed weight is only equivalent in steady
    state; on transients it misweights frames.

    ``slot`` is per-row: a (B,) int32 vector (or a scalar, broadcast)
    giving each row's ring slot. Streams updating on independent
    clocks therefore keep exact per-stream averaging ages — the
    reference's per-renderer history (render.c:738-771) has no
    cross-instance coupling and neither does this kernel.

    HBM traffic per update: ~(2F + 12) planes vs v1's ~(4F + 8).
    Interface: ``fn(pcm, grav, hist, sum, slot, fft_scale, fft_cutoff,
    g) -> (grav', hist', sum')`` — sum' IS the averaged texture (the
    input sum is only an aliasing donor).
    """
    (m, m1, m2, w1r, w1i, w2r, w2i, tr, ti, boost_re, boost_im) = _constants(n)
    F = frames
    wts = _age_weights(avg_weights, F)
    window = win.pcm_window(n)
    _prec = (jax.lax.Precision.DEFAULT if fast_math
             else jax.lax.Precision.HIGHEST)

    def kernel(slot_ref, scale_ref, cutoff_ref, g_ref,
               ar_ref, ai_ref, grav_ref, hist_ref, sum_ref,
               w1r_ref, w1i_ref, w2r_ref, w2i_ref, tr_ref, ti_ref,
               bre_ref, bim_ref,
               grav_out, hist_out, sum_out,
               old_scr, full_scr, dma_sem):
        B = ar_ref.shape[0]

        def dg(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_prec,
            )

        # ---- FFT + magnitude (as v1) ---------------------------------
        ar, ai = ar_ref[:], ai_ref[:]
        br = dg(ar, w1r_ref[:]) - dg(ai, w1i_ref[:])
        bi = dg(ai, w1r_ref[:]) + dg(ar, w1i_ref[:])
        cr = br * tr_ref[:] - bi * ti_ref[:]
        ci = br * ti_ref[:] + bi * tr_ref[:]
        dr = dg(cr, w2r_ref[:]) - dg(ci, w2i_ref[:])
        di = dg(ci, w2r_ref[:]) + dg(cr, w2i_ref[:])
        xr = dr.swapaxes(1, 2).reshape(B, m)
        xi = di.swapaxes(1, 2).reshape(B, m)
        fs2 = scale_ref[:][:, 0]
        fc2 = cutoff_ref[:][:, 0]
        mr = jnp.log(jnp.abs(xr) + 1.0) / 3.0
        mi = jnp.log(jnp.abs(xi) + 1.0) / 3.0
        mr = mr * jnp.maximum(bre_ref[:] * fs2 + (1.0 - fc2), 1.0)
        mi = mi * jnp.maximum(bim_ref[:] * fs2 + (1.0 - fc2), 1.0)
        spec = jnp.stack([mr, mi], axis=1)
        if texture_clamp:
            spec = jnp.clip(spec, 0.0, 1.0)

        # ---- gravity ---------------------------------------------------
        grav = jnp.maximum(grav_ref[:], spec) - g_ref[:]
        if texture_clamp:
            grav = jnp.clip(grav, 0.0, 1.0)
        grav_out[:] = grav

        i = pl.program_id(0)
        bt = B
        slots = [slot_ref[i * bt + r] for r in range(bt)]

        # read each row's full ring (HBM -> VMEM), overlapped
        rds = []
        for r in range(bt):
            rd = pltpu.make_async_copy(
                hist_ref.at[pl.ds(i * bt + r, 1)],
                full_scr.at[pl.ds(r, 1)], dma_sem.at[0, r],
            )
            rd.start()
            rds.append(rd)
        for rd in rds:
            rd.wait()

        # overwrite each row's slot in VMEM, then DMA just that slot
        # back so the HBM ring only takes a one-plane write
        for r in range(bt):
            full_scr[pl.ds(r, 1), pl.ds(slots[r], 1)] = grav[r][None, None]
        old_scr[:, 0] = grav
        wrs = []
        for r in range(bt):
            wr = pltpu.make_async_copy(
                old_scr.at[pl.ds(r, 1)],
                hist_out.at[pl.ds(i * bt + r, 1), pl.ds(slots[r], 1)],
                dma_sem.at[1, r],
            )
            wr.start()
            wrs.append(wr)

        # age-mapped weights (render.c:2252-2256 binds newest-first):
        # slot s holds the frame of age (slot_r - s) mod F, so weight
        # w[(slot_r - s) mod F] applies. Weights are selected as traced
        # scalars per row (a dynamic gather of a constant vector — and
        # assembling a vector from scalars — are not Mosaic-friendly),
        # each scaling a (1, 2, m) row slice on the VPU.
        for r in range(bt):
            acc = jnp.zeros((1, 2, m), jnp.float32)
            for f in range(F):
                w_rf = jnp.float32(0.0)
                for a in range(F):
                    # (slot_r - f) mod F == a  <=>  slot_r == (a + f) mod F
                    w_rf = jnp.where(
                        slots[r] == (a + f) % F, jnp.float32(wts[a]), w_rf
                    )
                acc = acc + w_rf * full_scr[r, f][None]
            sum_out[pl.ds(r, 1)] = acc
        for wr in wrs:
            wr.wait()

    def fn(pcm, grav, hist, ssum, slot, fft_scale, fft_cutoff, g):
        Btot = pcm.shape[0]
        bt = min(batch_tile, Btot)
        while Btot % bt:
            bt //= 2
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
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                bspec((bt, 1, 1), lambda i, *_: (i, 0, 0)),
                bspec((bt, 1, 1), lambda i, *_: (i, 0, 0)),
                bspec((bt, 1, 1), lambda i, *_: (i, 0, 0)),
                bspec((bt, m1, m2), lambda i, *_: (i, 0, 0)),
                bspec((bt, m1, m2), lambda i, *_: (i, 0, 0)),
                bspec((bt, 2, m), lambda i, *_: (i, 0, 0)),
                pl.BlockSpec(memory_space=pl.ANY),   # hist stays in HBM
                bspec((bt, 2, m), lambda i, *_: (i, 0, 0)),
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
                pl.BlockSpec(memory_space=pl.ANY),   # hist out (aliased)
                bspec((bt, 2, m), lambda i, *_: (i, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((bt, 1, 2, m), jnp.float32),
                pltpu.VMEM((bt, F, 2, m), jnp.float32),
                pltpu.SemaphoreType.DMA((2, bt)),
            ],
        )

        def reordered(slot_ref, scale_ref, cutoff_ref, g_ref,
                      ar_ref, ai_ref, grav_ref, hist_ref, sum_ref,
                      w1r_ref, w1i_ref, w2r_ref, w2i_ref, tr_ref, ti_ref,
                      bre_ref, bim_ref,
                      grav_out, hist_out, sum_out,
                      old_scr, full_scr, dma_sem):
            kernel(slot_ref, scale_ref, cutoff_ref, g_ref,
                   ar_ref, ai_ref, grav_ref, hist_ref, sum_ref,
                   w1r_ref, w1i_ref, w2r_ref, w2i_ref, tr_ref, ti_ref,
                   bre_ref, bim_ref,
                   grav_out, hist_out, sum_out,
                   old_scr, full_scr, dma_sem)

        grav2, hist2, sum2 = pl.pallas_call(
            reordered,
            grid_spec=grid_spec,
            out_shape=[
                jax.ShapeDtypeStruct((Btot, 2, m), jnp.float32),
                jax.ShapeDtypeStruct((Btot, F, 2, m), jnp.float32),
                jax.ShapeDtypeStruct((Btot, 2, m), jnp.float32),
            ],
            input_output_aliases={6: 0, 7: 1, 8: 2},
            # megacore: batch tiles are disjoint (per-row DMAs + aliased
            # HBM history rows), so the grid may split across the two
            # TensorCores
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True,
                dimension_semantics=(("parallel",) if megacore else None),
            ),
            cost_estimate=pl.CostEstimate(
                flops=Btot * (8 * m * (m1 + m2) + 2 * m * F),
                bytes_accessed=4 * Btot * (n + 2 * m * (F + 1) + 8 * m),
                transcendentals=Btot * n,
            ),
            interpret=interpret,
        )(
            _slotvec(slot, Btot),
            _rowvec(fft_scale, Btot),
            _rowvec(fft_cutoff, Btot),
            _rowvec(g, Btot),
            ar, ai, grav, hist, ssum,
            w1r, w1i, w2r, w2i, tr, ti, boost_re, boost_im,
        )
        return grav2, hist2, sum2

    return fn


def _slotvec(slot, B: int) -> jnp.ndarray:
    """Scalar or (B,) per-row history slot -> (B,) int32 prefetch."""
    arr = jnp.asarray(slot, jnp.int32)
    if arr.ndim == 0:
        arr = jnp.broadcast_to(arr, (B,))
    return arr
