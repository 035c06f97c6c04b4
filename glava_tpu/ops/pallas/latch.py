"""Joint first-event scan + value latch (Pallas).

The first-hit walk lowering (config/glsl_shader.py `_try_first_hit`)
reduces a boundary-walk loop to a cumulative min/max over an
event-keyed plane. When the shader then FETCHES the texture at the
walk result (the anti-alias idiom, reference graph/3.frag:84 —
``fragment = texelFetch(tex, ivec2(x, h2))``), the general path pays a
per-pixel data-dependent gather (the Pallas row-wise lookup, ~300 us
@1080p for four channels plus transposes).

This kernel instead carries the four candidate texel channels THROUGH
the scan: a Hillis-Steele pass over (E, 128) column blocks in VMEM
keeps (key, r, g, b, a) tuples moving together, selecting per step by
key comparison. One kernel produces both the scanned key plane and the
texel at each pixel's first event — no gather anywhere. The key
invariant: keys are unique per row (2*row + type), so min/max
selection is deterministic and the latched value is exactly the
candidate of the winning row.

Measured v5e @ (1081, 1920): ~a third of the rowwise-mc-lookup path it
replaces (see docs/STATUS.md round-4 notes).
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
def _build(E: int, W: int, C: int, reverse: bool, sent: float,
           interpret: bool):
    """Scan kernel over (E, W) planes: key + C value channels.

    ``reverse=True``: suffix min-scan (walks in +row direction — the
    first event at rows >= r). ``reverse=False``: prefix max-scan.
    ``sent`` is the no-event key sentinel (compares worse than every
    real key in the chosen direction).

    Flat Hillis-Steele over the full block height. A blocked two-level
    variant (3 masked intra-8-row steps + small block-summary scan +
    combine) was tried and measured SLOWER on v5e (C=4 @ (1081, 1920):
    254 vs 183 us) — Mosaic's sublane reshapes/iota masks cost more
    than the extra full-height passes save.
    """
    sent = np.float32(sent)

    def shift(x, s, fill):
        pad = jnp.full((s, x.shape[1]), fill, jnp.float32)
        if reverse:
            return jnp.concatenate([x[s:], pad], axis=0)
        return jnp.concatenate([pad, x[:-s]], axis=0)

    def pick(k, cs, ks, css):
        m = (k <= ks) if reverse else (k >= ks)
        return (jnp.where(m, k, ks),
                [jnp.where(m, c, cc) for c, cc in zip(cs, css)])

    def kernel(*refs):
        key_ref, c_refs = refs[0], refs[1:1 + C]
        okey_ref, o_refs = refs[1 + C], refs[2 + C:]
        k = key_ref[...]
        cs = [r[...] for r in c_refs]
        s = 1
        while s < E:
            ks = shift(k, s, sent)
            css = [shift(c, s, 0.0) for c in cs]
            k, cs = pick(k, cs, ks, css)
            s *= 2
        okey_ref[...] = k
        for i in range(C):
            o_refs[i][...] = cs[i]

    spec = pl.BlockSpec((E, _LANES), lambda i: (0, i))
    return pl.pallas_call(
        kernel,
        grid=(W // _LANES,),
        in_specs=[spec] * (1 + C),
        out_specs=[spec] * (1 + C),
        out_shape=[jax.ShapeDtypeStruct((E, W), jnp.float32)] * (1 + C),
        # the scan runs in place: aliasing inputs to outputs halves
        # the per-block VMEM footprint (10 full-height column blocks
        # exceed the 16M scoped default at 1080p), and a raised limit
        # covers the Hillis-Steele temporaries
        input_output_aliases={i: i for i in range(1 + C)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * (1 + C) * E * W * max(int(np.ceil(np.log2(E))), 1),
            bytes_accessed=4 * 2 * (1 + C) * E * W,
            transcendentals=0,
        ),
        interpret=interpret,
    )


def build_latch_scan(n_rows: int, n_cols: int, channels: int,
                     reverse: bool, sent: float,
                     interpret: bool = False):
    """Returns ``scan(key (E, W) f32, cands tuple of C (E, W) f32) ->
    (key_scan, latch_0, ..latch_{C-1})``.

    ``key_scan[r, c]`` is the running min (``reverse=True``, over rows
    >= r) or max (``reverse=False``, over rows <= r) of the key plane;
    each ``latch_i[r, c]`` is channel i of the candidate at the row
    that supplied ``key_scan[r, c]`` (zeros where ``key_scan`` is still
    ``sent``). Rows/cols are padded to sublane/lane multiples
    internally; key padding uses ``sent`` so it never wins.
    """
    E = ((n_rows + 7) // 8) * 8
    W = ((n_cols + _LANES - 1) // _LANES) * _LANES
    fn = _build(E, W, channels, reverse, float(sent), interpret)

    def scan(key, cands):
        args = [key] + list(cands)
        padded = []
        for i, a in enumerate(args):
            a = a.astype(jnp.float32)
            if a.shape != (E, W):
                fill = sent if i == 0 else 0.0
                a = jnp.pad(a, ((0, E - a.shape[0]), (0, W - a.shape[1])),
                            constant_values=fill)
            padded.append(a)
        outs = fn(*padded)
        return tuple(o[:n_rows, :n_cols] for o in outs)

    return scan
