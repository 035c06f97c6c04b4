"""Is there headroom in batching the static table lookup over fleet
streams? The mixed fleet's circle member does 3 lookups x 16 streams
(same static index planes, different per-stream tables) via jax.vmap
of the single-table kernel. Compare:

1. vmapped single-table kernel over 16 tables (the shipped path)
2. python-loop of 16 single-table calls (XLA schedules them)
3. one table, x16 cost extrapolation (lower bound)

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_batched_lookup.py
"""

import sys

import numpy as np

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from glava_tpu.ops.pallas.lookup import build_static_table_lookup
from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.utils.timing import probed_slope

_enable_compile_cache()

H, W, SZ, S = 256, 512, 2048, 16


def scan_cost(fn, *args, iters=16, n1=3, n2=9):
    def many(args):
        def body(acc, k):
            return acc + fn(*[a * (1 + 1e-6 * k) for a in args]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.float32))
        return acc

    j = jax.jit(many)
    float(j(args))
    return probed_slope(lambda: j(args), n1, n2) / iters


def main():
    print("backend:", jax.default_backend())
    # circle-like polar indices at the fleet's 512x256 geometry
    x = np.arange(W) - W // 2
    y = (np.arange(H) - H // 2)[:, None]
    theta = np.arctan2(y, x)
    dist = np.maximum(np.sqrt(x * x + y * y), 1e-6)
    rows = []
    for adv in (0.0, 0.75, -0.75):
        pos = np.abs(theta + adv / dist * 100) / np.pi % 1.0
        i = np.clip(np.round(pos * SZ), 0, SZ - 1).astype(np.int64)
        rows.append((i + np.where(theta > 0, 0, SZ)).reshape(-1))
    idx3 = np.stack(rows)
    lk = build_static_table_lookup(idx3, 2 * SZ)
    tables = jnp.asarray(np.random.default_rng(0)
                         .standard_normal((S, 2 * SZ)).astype(np.float32))

    t1 = scan_cost(lambda t: lk(t[0]).sum(), tables)
    print(f"single table 3x{idx3.shape[1]} pts: {t1*1e6:8.1f} us "
          f"(x{S} = {t1*S*1e6:.0f})")

    vm = jax.vmap(lk)
    tv = scan_cost(lambda t: vm(t).sum(), tables)
    print(f"vmapped x{S}:                  {tv*1e6:8.1f} us")

    tl = scan_cost(lambda t: sum(lk(t[s]).sum() for s in range(S)), tables)
    print(f"python-loop x{S}:              {tl*1e6:8.1f} us")

    # dense all-chunk kernel at the same size (is the sorted-block
    # kernel overhead-bound at small planes?)
    from glava_tpu.ops.pallas.lookup import build_table_lookup

    lkd = build_table_lookup(3, 2 * SZ, idx3.shape[1])
    ic = jnp.asarray(idx3.astype(np.int32))
    td1 = scan_cost(lambda t: lkd(t[0], ic).sum(), tables)
    print(f"dense single table:            {td1*1e6:8.1f} us")
    vmd = jax.vmap(lambda t: lkd(t, ic))
    tdv = scan_cost(lambda t: vmd(t).sum(), tables)
    print(f"dense vmapped x{S}:            {tdv*1e6:8.1f} us")

    # v1 sorted-block kernel
    import os
    os.environ["GLAVA_TPU_STATIC_LK_V1"] = "1"
    lk1 = build_static_table_lookup(idx3, 2 * SZ)
    os.environ.pop("GLAVA_TPU_STATIC_LK_V1")
    tv1 = scan_cost(lambda t: lk1(t[0]).sum(), tables)
    print(f"v1-sorted single table:        {tv1*1e6:8.1f} us")
    vm1 = jax.vmap(lk1)
    tv1v = scan_cost(lambda t: vm1(t).sum(), tables)
    print(f"v1-sorted vmapped x{S}:        {tv1v*1e6:8.1f} us")


if __name__ == "__main__":
    main()
