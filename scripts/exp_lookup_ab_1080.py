"""One-process A/B of the static-lookup kernels at 1080p scale:
subgroup v2 (default) vs block v1 vs dense, on circle-like polar
index planes (3x2M points) and a single 2M plane, interleaved.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_lookup_ab_1080.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import jax
import jax.numpy as jnp

from glava_tpu.runtime.engine import _enable_compile_cache
from glava_tpu.utils.timing import probed_slope

_enable_compile_cache()

H, W, SZ = 1080, 1920, 2048


def scan_cost(fn, *args, iters=16, n1=3, n2=9):
    def many(args):
        def body(acc, k):
            return acc + fn(*[a * (1 + 1e-6 * k) for a in args]), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(iters, dtype=jnp.float32))
        return acc

    j = jax.jit(many)
    float(j(args))
    return probed_slope(lambda: j(args), n1, n2, repeats=3) / iters


def make_idx():
    x = np.arange(W) - W // 2
    y = (np.arange(H) - H // 2)[:, None]
    theta = np.arctan2(y, x)
    dist = np.maximum(np.sqrt(x * x + y * y), 1e-6)
    rows = []
    for adv in (0.0, 0.75, -0.75):
        pos = np.abs(theta + adv / dist * 100) / np.pi % 1.0
        i = np.clip(np.round(pos * SZ), 0, SZ - 1).astype(np.int64)
        rows.append((i + np.where(theta > 0, 0, SZ)).reshape(-1))
    return np.stack(rows)


def main():
    from glava_tpu.ops.pallas.lookup import (build_static_table_lookup,
                                             build_table_lookup)

    print("backend:", jax.default_backend())
    idx3 = make_idx()
    table = jnp.asarray(np.random.default_rng(0)
                        .standard_normal(2 * SZ).astype(np.float32))

    def build(v1: bool, idx):
        if v1:
            os.environ["GLAVA_TPU_STATIC_LK_V1"] = "1"
        try:
            return build_static_table_lookup(idx, 2 * SZ)
        finally:
            os.environ.pop("GLAVA_TPU_STATIC_LK_V1", None)

    for label, idx in (("3x2M", idx3), ("1x2M", idx3[:1])):
        lk2 = build(False, idx)
        lk1 = build(True, idx)
        lkd = build_table_lookup(idx.shape[0], 2 * SZ, idx.shape[1])
        ic = jnp.asarray(idx.astype(np.int32))
        for rnd in range(2):
            t2 = scan_cost(lambda t: lk2(t).sum(), table)
            t1 = scan_cost(lambda t: lk1(t).sum(), table)
            td = scan_cost(lambda t: lkd(t, ic).sum(), table)
            print(f"{label} round {rnd}: v2 {t2*1e6:7.1f} us | "
                  f"v1 {t1*1e6:7.1f} | dense {td*1e6:7.1f}", flush=True)


if __name__ == "__main__":
    main()
