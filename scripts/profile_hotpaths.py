"""Decompose the slow-path frame costs on the real TPU (round 4).

Measures, with the honest protocol (scalar probes, fresh inputs, scan
amortization, two-point slopes):

1. native circle @1080p: full step vs step with the triple static
   lookup replaced by a free broadcast (isolates the lookup cost) and
   the smooth/premultiply tail.
2. the static sorted-block lookup in isolation at circle's real index
   planes, including the final-perm row gather on its own.
3. interpreted graph+AA: full frame vs the rowwise mc boundary lookup
   and the f32 cummin scan in isolation.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python scripts/profile_hotpaths.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.utils.timing import probed_slope

_enable_compile_cache()


def scan_cost(fn, *args, iters=16, n1=3, n2=9):
    """Marginal per-iteration cost of fn(*args, k) under lax.scan with
    fresh inputs per iteration and a carry reduction."""

    def many(args):
        def body(acc, k):
            return acc + fn(*args, k), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.float32))
        return acc

    j = jax.jit(many)
    probe = j(args)
    float(probe)

    def once():
        return j(args)

    return probed_slope(once, n1, n2) / iters


def main():
    print("backend:", jax.default_backend())

    # ---- 2. static sorted-block lookup microbench --------------------
    from glava_tpu.ops.pallas.lookup import (build_static_table_lookup,
                                             build_table_lookup)

    h, w = 1080, 1920
    sz = 2048
    # circle-like polar index planes (three of them, stacked)
    x = np.arange(w) - w // 2
    y = (np.arange(h) - h // 2)[:, None]
    theta = np.arctan2(y, x)
    dist = np.maximum(np.sqrt(x * x + y * y), 1e-6)
    rows = []
    for adv in (0.0, 0.75, -0.75):
        pos = np.abs(theta + adv / dist * 100) / np.pi % 1.0
        i = np.clip(np.round(pos * sz), 0, sz - 1).astype(np.int64)
        comb = i + np.where(theta > 0, 0, sz)
        rows.append(comb.reshape(-1))
    idx3 = np.stack(rows)
    table = jnp.asarray(np.random.default_rng(0)
                        .standard_normal(2 * sz).astype(np.float32))

    lk = build_static_table_lookup(idx3, 2 * sz)
    t = scan_cost(lambda tab, k: lk(tab * (1 + 1e-6 * k)).sum(), table)
    print(f"static sorted lookup 3x2M pts: {t*1e6:.1f} us")

    lk1 = build_static_table_lookup(idx3[0], 2 * sz)
    t = scan_cost(lambda tab, k: lk1(tab * (1 + 1e-6 * k)).sum(), table)
    print(f"static sorted lookup 1x2M pts: {t*1e6:.1f} us")

    # dense (all-chunk) kernel comparison
    lkd = build_table_lookup(1, 2 * sz, idx3[0].size)
    ic = jnp.asarray(idx3[:1].astype(np.int32))
    t = scan_cost(lambda tab, k: lkd(tab * (1 + 1e-6 * k), ic).sum(), table)
    print(f"dense lane-shuffle lookup 1x2M pts: {t*1e6:.1f} us")

    # the final-perm row gather alone (47k rows x 128)
    nrows = -(-idx3[0].size // 128)
    perm = np.random.default_rng(0).permutation(nrows).astype(np.int32)
    src = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((nrows, 128)).astype(np.float32))
    permj = jnp.asarray(perm)

    t = scan_cost(lambda s, k: (s * (1 + 1e-6 * k))[permj].sum(), src)
    print(f"row-gather {nrows}x128 (final perm): {t*1e6:.1f} us")

    # ---- 1. native circle @1080p decomposition -----------------------
    from glava_tpu.config import loader
    from glava_tpu.renderer import Renderer

    lcm = loader.load(cli_requests=("setgeometry 0 0 1920 1080",
                                    "setprintframes false"),
                      force_module="circle")
    rm = Renderer(lcm)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(rng.standard_normal((2, lcm.cfg.bufsize))
                       .astype(np.float32) * 0.3)
    g = jnp.float32(lcm.cfg.gravity_step / lcm.cfg.nominal_ups)
    print("circle cfg: bufsize", lcm.cfg.bufsize, "sz should follow")

    state0 = rm.init_state()

    def full(state, snap, g, k):
        s, fr = rm.step(state, snap * (1.0 + 1e-3 * k), True,
                        jnp.float32(0.1), jnp.float32(1.0), g, {})
        return fr.sum()

    def full_scan(state, snap, g):
        def body(carry, k):
            s, acc = carry
            s, fr = rm.step(s, snap * (1.0 + 1e-3 * k), True,
                            jnp.float32(0.1), jnp.float32(1.0), g, {})
            return (s, acc + fr.sum()), None

        (s2, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)),
            jnp.arange(16, dtype=jnp.float32))
        return s2, acc

    fj = jax.jit(full_scan, donate_argnums=(0,))
    st, probe = fj(state0, snap, g)
    float(probe)

    def once():
        nonlocal_state[0], p = fj(nonlocal_state[0], snap, g)
        return p

    nonlocal_state = [st]
    per = probed_slope(once, 3, 9) / 16
    print(f"native circle full step: {per*1e6:.1f} us -> {1/per:.0f} fps")

    # pipeline-only step (update chain without raster): approximate by
    # bars at the same geometry for scale
    lcb = loader.load(cli_requests=("setgeometry 0 0 1920 1080",
                                    "setprintframes false"),
                      force_module="bars")
    rb = Renderer(lcb)

    def bars_scan(state, snap, g):
        def body(carry, k):
            s, acc = carry
            s, fr = rb.step(s, snap * (1.0 + 1e-3 * k), True,
                            jnp.float32(0.1), jnp.float32(1.0), g, {})
            return (s, acc + fr.sum()), None

        (s2, acc), _ = jax.lax.scan(
            body, (state, jnp.float32(0.0)),
            jnp.arange(16, dtype=jnp.float32))
        return s2, acc

    bj = jax.jit(bars_scan, donate_argnums=(0,))
    stb, pb = bj(rb.init_state(), snap, g)
    float(pb)
    nb = [stb]

    def onceb():
        nb[0], p = bj(nb[0], snap, g)
        return p

    perb = probed_slope(onceb, 3, 9) / 16
    print(f"native bars full step (same geom): {perb*1e6:.1f} us "
          f"-> {1/perb:.0f} fps")


if __name__ == "__main__":
    main()
