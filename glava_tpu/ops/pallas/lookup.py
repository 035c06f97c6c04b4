"""Fast per-pixel table lookup (Pallas): gather replacement.

XLA lowers a (H, W)-indexed gather from a small 1-D table to something
pathologically slow on TPU (measured ~15 ms for 2M indices from a 4k
table at 1080p — it dominates any raster that samples a texture per
pixel, e.g. the circle module's three smooth_audio fetches,
circle/1.frag:29-33). Mosaic, however, lowers an equal-shape
``take_along_axis`` over the 128-lane axis to a native lane shuffle.

This op decomposes an arbitrary lookup ``out = table[idx]`` into
``idx = 128*hi + lo``:

    out = sum_h [hi == h] * lane_shuffle(table_row_h, lo)

i.e. T/128 lane shuffles + selects per tile, all VPU work. The result
is bit-exact with the jnp gather (pure data movement).
"""

from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


@lru_cache(maxsize=None)
def _build(L: int, T: int, NT: int, R: int, interpret: bool):
    """Kernel for (L, NT*R*128) lookups from one shared (T,) table."""
    H = T // _LANES  # number of 128-wide table rows

    def kernel(tab_ref, idx_ref, out_ref):
        for l in range(L):
            idx = idx_ref[l, 0]                      # (R, 128) int32
            lo = jnp.bitwise_and(idx, _LANES - 1)
            hi = jnp.right_shift(idx, 7)
            acc = jnp.zeros((R, _LANES), jnp.float32)
            for h in range(H):
                row = tab_ref[0, pl.ds(h * _LANES, _LANES)]   # (128,)
                g = jnp.take_along_axis(
                    jnp.broadcast_to(row[None], (R, _LANES)), lo, axis=1
                )
                acc = jnp.where(hi == h, g, acc)
            out_ref[l, 0] = acc

    def fn(table, idx):
        # table (T,) f32; idx (L, NT, R, 128) int32
        return pl.pallas_call(
            kernel,
            grid=(NT,),
            in_specs=[
                pl.BlockSpec((1, T), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((L, 1, R, _LANES), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((L, 1, R, _LANES),
                                   lambda i: (0, i, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, NT, R, _LANES), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=L * NT * R * _LANES * H * 2,
                bytes_accessed=4 * L * NT * R * _LANES * 2 + 4 * T,
                transcendentals=0,
            ),
            interpret=interpret,
        )(table.reshape(1, T), idx)

    return fn


def build_table_lookup(n_lookups: int, table_size: int, n_points: int,
                       tile_rows: int = 256, interpret: bool = False):
    """Returns ``lookup(table (T,), idx (L, P) int32) -> (L, P) f32``
    with static idx padding baked at build time.

    ``table_size`` is padded up to a multiple of 128 (callers must pad
    the table the same way); ``n_points`` is padded to a tile multiple
    internally. Index values must lie in [0, table_size).
    """
    T = ((table_size + _LANES - 1) // _LANES) * _LANES
    tile = tile_rows * _LANES
    P_pad = ((n_points + tile - 1) // tile) * tile
    NT = P_pad // tile
    fn = _build(n_lookups, T, NT, tile_rows, interpret)

    def lookup(table, idx):
        tab = table.astype(jnp.float32)
        if tab.shape[-1] != T:
            tab = jnp.pad(tab, (0, T - tab.shape[-1]))
        if idx.shape[-1] != P_pad:
            idx = jnp.pad(idx, ((0, 0), (0, P_pad - idx.shape[-1])))
        out = fn(tab, idx.reshape(n_lookups, NT, tile_rows, _LANES))
        return out.reshape(n_lookups, P_pad)[:, :n_points]

    return lookup


@lru_cache(maxsize=None)
def _build_rowwise(N: int, T: int, P: int, R: int, interpret: bool):
    """Kernel for per-ROW tables: out[i, j] = tabs[i, idx[i, j]]."""
    H = T // _LANES

    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[...]                            # (R, 128) int32
        lo = jnp.bitwise_and(idx, _LANES - 1)
        hi = jnp.right_shift(idx, 7)
        acc = jnp.zeros(idx.shape, jnp.float32)
        for h in range(H):
            rows = tab_ref[:, h * _LANES:(h + 1) * _LANES]   # (R, 128)
            g = jnp.take_along_axis(rows, lo, axis=1)
            acc = jnp.where(hi == h, g, acc)
        out_ref[...] = acc

    def fn(tabs, idx):
        return pl.pallas_call(
            kernel,
            grid=(N // R, P // _LANES),
            in_specs=[
                pl.BlockSpec((R, T), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((R, _LANES), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((R, _LANES), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((N, P), jnp.float32),
            cost_estimate=pl.CostEstimate(
                flops=N * P * H * 2,
                bytes_accessed=4 * N * (T + 2 * P),
                transcendentals=0,
            ),
            interpret=interpret,
        )(tabs, idx)

    return fn


def build_rowwise_lookup(n_rows: int, table_size: int, n_points: int,
                         tile_rows: int = 8, interpret: bool = False):
    """Returns ``lookup(tabs (N, T), idx (N, P) int32) -> (N, P) f32``
    where row i gathers from its OWN table: out[i, j] = tabs[i, idx[i, j]].

    The column-aligned 2-D texture fetch (e.g. the graph anti-alias
    walk's ``texelFetch(prev, ivec2(col + d, y))`` with a traced y)
    becomes this after transposing: per output column, the source
    column is a private table indexed along the 128-lane axis — Mosaic
    lowers the equal-shape ``take_along_axis`` per row natively.
    Measured @1080p: ~214 us vs ~21 ms for BOTH the XLA 2-D gather and
    XLA take_along_axis (98x), bit-exact.

    ``table_size``/``n_points`` are padded to lane multiples (callers
    pad the same way); ``n_rows`` must divide by ``tile_rows``. Index
    values must lie in [0, table_size).
    """
    T = ((table_size + _LANES - 1) // _LANES) * _LANES
    P = ((n_points + _LANES - 1) // _LANES) * _LANES
    R = tile_rows
    N = ((n_rows + R - 1) // R) * R
    fn = _build_rowwise(N, T, P, R, interpret)

    def lookup(tabs, idx):
        tabs = tabs.astype(jnp.float32)
        if tabs.shape != (N, T):
            tabs = jnp.pad(tabs, ((0, N - tabs.shape[0]),
                                  (0, T - tabs.shape[1])))
        if idx.shape != (N, P):
            idx = jnp.pad(idx, ((0, N - idx.shape[0]),
                                (0, P - idx.shape[1])))
        return fn(tabs, idx)[:n_rows, :n_points]

    return lookup


@lru_cache(maxsize=None)
def _build_rowwise_mc(N: int, T: int, P: int, R: int, C: int,
                      interpret: bool):
    """Multi-channel per-row tables sharing ONE index plane:
    out[c][i, j] = tabs[c][i, idx[i, j]] — the index decode (lo/hi
    split and the per-chunk selection masks) is computed once for all
    C channels instead of once per channel."""
    H = T // _LANES

    def kernel(*refs):
        tab_refs, idx_ref, out_refs = refs[:C], refs[C], refs[C + 1:]
        idx = idx_ref[...]                            # (R, 128) int32
        lo = jnp.bitwise_and(idx, _LANES - 1)
        hi = jnp.right_shift(idx, 7)
        accs = [jnp.zeros(idx.shape, jnp.float32) for _ in range(C)]
        for h in range(H):
            m = hi == h
            for c in range(C):
                rows = tab_refs[c][:, h * _LANES:(h + 1) * _LANES]
                g = jnp.take_along_axis(rows, lo, axis=1)
                accs[c] = jnp.where(m, g, accs[c])
        for c in range(C):
            out_refs[c][...] = accs[c]

    def fn(tabs, idx):
        # tabs: C arrays (N, T) f32; idx (N, P) int32
        tab_spec = pl.BlockSpec((R, T), lambda i, j: (i, 0),
                                memory_space=pltpu.VMEM)
        pt_spec = pl.BlockSpec((R, _LANES), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM)
        return pl.pallas_call(
            kernel,
            grid=(N // R, P // _LANES),
            in_specs=[tab_spec] * C + [pt_spec],
            out_specs=[pt_spec] * C,
            out_shape=[jax.ShapeDtypeStruct((N, P), jnp.float32)] * C,
            cost_estimate=pl.CostEstimate(
                flops=N * P * H * 2 * C,
                bytes_accessed=4 * N * (C * T + (1 + C) * P),
                transcendentals=0,
            ),
            interpret=interpret,
        )(*tabs, idx)

    return fn


def build_rowwise_lookup_mc(n_rows: int, table_size: int, n_points: int,
                            channels: int, tile_rows: int = 8,
                            interpret: bool = False):
    """Returns ``lookup(tabs tuple of C (N, T), idx (N, P) int32) ->
    tuple of C (N, P) f32`` — the multi-channel form of
    :func:`build_rowwise_lookup` (one shared index decode; used for
    RGBA texture fetches at a data-dependent row plane)."""
    T = ((table_size + _LANES - 1) // _LANES) * _LANES
    P = ((n_points + _LANES - 1) // _LANES) * _LANES
    R = tile_rows
    N = ((n_rows + R - 1) // R) * R
    fn = _build_rowwise_mc(N, T, P, R, channels, interpret)

    def lookup(tabs, idx):
        padded = []
        for t in tabs:
            t = t.astype(jnp.float32)
            if t.shape != (N, T):
                t = jnp.pad(t, ((0, N - t.shape[0]), (0, T - t.shape[1])))
            padded.append(t)
        if idx.shape != (N, P):
            idx = jnp.pad(idx, ((0, N - idx.shape[0]),
                                (0, P - idx.shape[1])))
        outs = fn(tuple(padded), idx)
        return tuple(o[:n_rows, :n_points] for o in outs)

    return lookup


_SUB = 8  # sublane granularity: chunk windows are per 8-row subgroup


@lru_cache(maxsize=None)
def _build_subgroup_bucket(nb: int, Tpad: int, G: int, K: int,
                           interpret: bool):
    """One subgroup bucket: each (8, 128) subgroup of STATICALLY
    sorted index rows selects over its OWN K-chunk window (base from
    the scalar-prefetched meta array). A grid block covers G subgroups
    so the hardware grid stays coarse while the select windows stay
    per-subgroup tight — ~4x less VPU work than the 64-row-block
    window at circle@1080p coherence."""
    def kernel(meta_ref, tab_ref, idx_ref, out_ref):
        pid = pl.program_id(0)
        for j in range(G):
            b = meta_ref[pid * G + j]
            ix = idx_ref[j * _SUB:(j + 1) * _SUB, :]
            lo = jnp.bitwise_and(ix, _LANES - 1)
            hi = jnp.right_shift(ix, 7)
            acc = jnp.zeros((_SUB, _LANES), jnp.float32)
            for k in range(K):
                row = tab_ref[0, pl.ds((b + k) * _LANES, _LANES)]
                g = jnp.take_along_axis(
                    jnp.broadcast_to(row[None], (_SUB, _LANES)), lo,
                    axis=1)
                acc = jnp.where(hi == b + k, g, acc)
            out_ref[j * _SUB:(j + 1) * _SUB, :] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((1, Tpad), lambda i, m: (0, 0)),
                  pl.BlockSpec((G * _SUB, _LANES), lambda i, m: (i, 0))],
        out_specs=pl.BlockSpec((G * _SUB, _LANES), lambda i, m: (i, 0)))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * G * _SUB, _LANES),
                                       jnp.float32),
        interpret=interpret)


@lru_cache(maxsize=None)
def _build_bucket(nb: int, Tpad: int, R: int, K: int, interpret: bool):
    """One sorted-block bucket: each (R, 128) block of STATICALLY
    sorted index rows selects over its own K-chunk window of the table
    (scalar-prefetched base) instead of every T/128 chunk."""
    def kernel(meta_ref, tab_ref, idx_ref, out_ref):
        b = meta_ref[pl.program_id(0)]
        ix = idx_ref[...]
        lo = jnp.bitwise_and(ix, _LANES - 1)
        hi = jnp.right_shift(ix, 7)
        acc = jnp.zeros(ix.shape, jnp.float32)
        for j in range(K):
            row = tab_ref[0, pl.ds((b + j) * _LANES, _LANES)]
            g = jnp.take_along_axis(
                jnp.broadcast_to(row[None], (R, _LANES)), lo, axis=1)
            acc = jnp.where(hi == b + j, g, acc)
        out_ref[...] = acc

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(nb,),
        in_specs=[pl.BlockSpec((1, Tpad), lambda i, m: (0, 0)),
                  pl.BlockSpec((R, _LANES), lambda i, m: (i, 0))],
        out_specs=pl.BlockSpec((R, _LANES), lambda i, m: (i, 0)))
    return pl.pallas_call(
        kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb * R, _LANES), jnp.float32),
        interpret=interpret)


def build_static_table_lookup(idx, table_size: int, tile_rows: int = 64,
                              k_small: int = 16, interpret: bool = False):
    """Gather from a 1-D table at STATIC indices: ``lookup(table) ->
    table[idx]`` (same shape as ``idx``), exploiting index coherence.

    The index rows (128-lane groups) are sorted by their minimum table
    chunk at BUILD time and grouped into (tile_rows, 128) blocks; each
    block then selects only over its own chunk window — statically
    unrolled per bucket (most blocks of a spatially coherent pattern
    like polar sampling touch <= k_small of the T/128 chunks; the
    long-tail blocks go to a second bucket at the max span) — instead
    of every chunk like :func:`build_table_lookup`. Results return to
    the original order via a static row gather (cheap). Measured on
    circle@1080p indices (2M points, 8192-entry table, v5e): 231 us vs
    573 us for the dense kernel, bit-exact. Index values must lie in
    [0, table_size).
    """
    import os

    idx = np.asarray(idx)
    shape = idx.shape
    flat = idx.reshape(-1).astype(np.int64)
    P = flat.size
    T = ((table_size + _LANES - 1) // _LANES) * _LANES
    nrows = -(-P // _LANES)
    R = tile_rows
    if nrows < 2 * R:  # too small to amortize; use the dense kernel
        lk = build_table_lookup(1, table_size, P, interpret=interpret)
        flat32 = flat.astype(np.int32)  # numpy: converted per call

        def small(table):
            return lk(table, jnp.asarray(flat32)[None, :]
                      )[0].reshape(shape)

        return small
    idxp = np.full((nrows, _LANES), int(flat[-1]), np.int64)
    idxp.reshape(-1)[:P] = flat
    hi = idxp >> 7
    perm = np.argsort(hi.min(1), kind="stable")
    if os.environ.get("GLAVA_TPU_STATIC_LK_V1", "") != "1":
        base = _static_lookup_subgroup(idxp, perm, P, T, shape, interpret)
        return _maybe_dense_single(base, flat, table_size, P, nrows, T,
                                   shape, interpret)
    nblk = -(-nrows // R)
    perm_p = np.concatenate([perm, np.repeat(perm[-1:], nblk * R - nrows)])
    rows_sorted = idxp[perm_p]
    hs = rows_sorted >> 7
    hb = hs.reshape(nblk, R, _LANES)
    bases = hb.min(axis=(1, 2)).astype(np.int32)
    cnts = (hb.max(axis=(1, 2)) - bases + 1).astype(np.int32)
    b1 = np.nonzero(cnts <= k_small)[0]
    b2 = np.nonzero(cnts > k_small)[0]
    K2 = int(cnts[b2].max()) if b2.size else 0
    Tpad = T + max(k_small, K2) * _LANES

    buckets = []
    for ids, K in ((b1, k_small), (b2, K2)):
        if not ids.size:
            continue
        rows = rows_sorted.reshape(nblk, R, _LANES)[ids].reshape(-1, _LANES)
        buckets.append((
            _build_bucket(len(ids), Tpad, R, K, interpret),
            bases[ids],
            rows.astype(np.int32),
        ))
    order = np.concatenate([b for b, K in ((b1, 0), (b2, 0)) if b.size]) \
        if (b1.size and b2.size) else (b1 if b1.size else b2)
    out_rows_order = (order[:, None] * R + np.arange(R)).reshape(-1)
    inv_sorted = np.empty(nblk * R, np.int64)
    inv_sorted[out_rows_order] = np.arange(nblk * R)
    pos_of_orig = np.empty(nblk * R, np.int64)
    pos_of_orig[perm_p] = np.arange(nblk * R)
    final_perm = inv_sorted[pos_of_orig[:nrows]].astype(np.int32)

    def lookup(table):
        tab = jnp.asarray(table, jnp.float32).reshape(-1)
        tab = jnp.pad(tab, (0, Tpad - tab.shape[0]))[None, :]
        parts = [fn(jnp.asarray(bs), tab, jnp.asarray(rows))
                 for fn, bs, rows in buckets]
        allout = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        ordered = allout[jnp.asarray(final_perm)]
        return ordered.reshape(-1)[:P].reshape(shape)

    return lookup


# Small-plane single-table crossover: the subgroup kernel's grid /
# scalar-prefetch overheads dominate below a few thousand index rows,
# where the dense all-chunk kernel is ~6x faster UNBATCHED (measured
# v5e, 3x131k pts / 4096-entry table: dense 33 us vs subgroup 192) —
# but the subgroup kernel vmaps far better (x16 tables: 292 us vs the
# dense kernel's 815). custom_vmap routes each call to the winner.
# Bounds are the measured-safe region: dense cost scales with
# nrows * chunks, so both guards pin to the measured win point.
_DENSE_SINGLE_MAX_ROWS = 4096
_DENSE_SINGLE_MAX_WORK = 3072 * 32  # nrows * (table chunks)


def _maybe_dense_single(base, flat, table_size, P, nrows, T, shape,
                        interpret):
    """Wrap a batched-friendly lookup so UNBATCHED calls take the
    dense all-chunk kernel when the plane is small enough for it to
    win; vmapped calls keep ``base``. Bit-exact either way (both
    kernels are pinned against the jnp gather)."""
    chunks = max(T // _LANES, 1)
    if nrows > _DENSE_SINGLE_MAX_ROWS \
            or nrows * chunks > _DENSE_SINGLE_MAX_WORK:
        return base
    import jax
    from jax.custom_batching import custom_vmap

    lkd = build_table_lookup(1, table_size, P, interpret=interpret)
    idx_np = flat.astype(np.int32)  # numpy: converted per call

    @custom_vmap
    def lookup(table):
        return lkd(table, jnp.asarray(idx_np)[None, :])[0].reshape(shape)

    @lookup.def_vmap
    def _rule(axis_size, in_batched, table):  # noqa: ANN001
        (tb,) = in_batched
        out = jax.vmap(base)(table) if tb else base(table)
        return out, tb

    return lookup


# subgroup bucket K levels: a subgroup whose chunk span exceeds the
# largest level joins a tail bucket at the observed maximum span
_K_LEVELS = (2, 4, 8, 16)
_SUB_G = 16  # subgroups per grid block (block = 128 index rows)


def _static_lookup_subgroup(idxp, perm, P, T, shape, interpret):
    """Per-8-row-subgroup chunk windows (the v2 static lookup).

    The 64-row-block variant pays for the whole block's chunk span on
    every row; after the coherence sort, an 8-row subgroup spans ~4x
    fewer chunks, so selecting per-subgroup (base scalar-prefetched,
    window statically unrolled per bucket level) cuts the VPU work
    proportionally. Measured v5e @ circle's three 1080p index planes
    (6.2M points, 4096-entry table): 566 -> 163 us, bit-exact."""
    nrows = idxp.shape[0]
    nsub = -(-nrows // _SUB)
    perm_p = np.concatenate(
        [perm, np.repeat(perm[-1:], nsub * _SUB - nrows)])
    rows_sorted = idxp[perm_p]                    # (nsub*_SUB, 128)
    hs = rows_sorted >> 7
    hb = hs.reshape(nsub, _SUB, _LANES)
    bases = hb.min(axis=(1, 2)).astype(np.int32)
    cnts = (hb.max(axis=(1, 2)) - bases + 1).astype(np.int32)
    kmax = int(cnts.max())
    levels = [k for k in _K_LEVELS if k < kmax] + [kmax]
    assign = np.searchsorted(np.asarray(levels), cnts)
    Tpad = T + levels[-1] * _LANES

    buckets = []
    sub_out_start = np.empty(nsub, np.int64)
    ofs = 0
    for li, K in enumerate(levels):
        ids = np.nonzero(assign == li)[0]
        if not ids.size:
            continue
        npad = (-(-ids.size // _SUB_G)) * _SUB_G
        ids_p = np.concatenate(
            [ids, np.repeat(ids[-1:], npad - ids.size)])
        rows = rows_sorted.reshape(nsub, _SUB, _LANES)[ids_p] \
            .reshape(-1, _LANES)
        # NUMPY at build time: the closure may be cached across jit
        # programs (glsl_shader._STATIC_LK_CACHE), so jnp conversion
        # must happen per call or the cache leaks tracers
        buckets.append((
            _build_subgroup_bucket(npad // _SUB_G, Tpad, _SUB_G, K,
                                   interpret),
            bases[ids_p],
            rows.astype(np.int32),
        ))
        sub_out_start[ids] = ofs + np.arange(ids.size) * _SUB
        ofs += npad * _SUB
    ar = np.arange(nsub * _SUB)
    inv_sorted = sub_out_start[ar // _SUB] + ar % _SUB
    pos_of_orig = np.empty(nsub * _SUB, np.int64)
    pos_of_orig[perm_p] = ar
    final_perm = inv_sorted[pos_of_orig[:nrows]].astype(np.int32)

    def lookup(table):
        tab = jnp.asarray(table, jnp.float32).reshape(-1)
        tab = jnp.pad(tab, (0, Tpad - tab.shape[0]))[None, :]
        parts = [fn(jnp.asarray(bs), tab, jnp.asarray(rows))
                 for fn, bs, rows in buckets]
        allout = parts[0] if len(parts) == 1 else jnp.concatenate(parts, 0)
        ordered = allout[jnp.asarray(final_perm)]
        return ordered.reshape(-1)[:P].reshape(shape)

    return lookup
