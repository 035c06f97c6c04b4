"""Kernel autotuning ("wisdom") — the GLFFT wisdom equivalent.

The reference's GLFFT library benchmarks workgroup/vector/shared-memory
variants per FFT size and serializes the winners to JSON
(glfft/glfft_wisdom.cpp, learn_optimal_options at glfft_wisdom.hpp:94,
JSON IO at glfft_wisdom.hpp:119-123). Here the tunable is the fused
update kernel's batch tile (VMEM residency vs grid parallelism);
winners persist to ``~/.cache/glava_tpu/wisdom.json`` keyed by device
kind and problem shape.

Tuning is opt-in (`learn=True` or the `glava-tpu-bench --tune` flag);
without a cache entry a safe default is used (bt=8, measured best on
TPU v5e for the shipped buffer sizes).
"""

from __future__ import annotations

import json
import os
import time
from pathlib import Path

DEFAULT_TILE = 16  # measured best for the incremental kernel on v5e
_CANDIDATES = (8, 16, 32)

_cache: dict | None = None


def wisdom_path() -> Path:
    base = os.environ.get("XDG_CACHE_HOME", os.path.expanduser("~/.cache"))
    return Path(base) / "glava_tpu" / "wisdom.json"


def _load() -> dict:
    global _cache
    if _cache is None:
        try:
            _cache = json.loads(wisdom_path().read_text())
        except (OSError, ValueError):
            _cache = {}
    return _cache


def _save(cache: dict) -> None:
    try:
        p = wisdom_path()
        p.parent.mkdir(parents=True, exist_ok=True)
        p.write_text(json.dumps(cache, indent=1, sort_keys=True))
    except OSError:
        pass


def _key(n: int, frames: int) -> str:
    import jax

    dev = jax.devices()[0]
    return f"{dev.device_kind}/fused_update_inc/n{n}/f{frames}"


def best_batch_tile(n: int, frames: int, learn: bool = False) -> int:
    cache = _load()
    key = _key(n, frames)
    if key in cache:
        return int(cache[key]["batch_tile"])
    if not learn:
        return DEFAULT_TILE
    result = learn_batch_tile(n, frames)
    cache[key] = result
    _save(cache)
    return int(result["batch_tile"])


def learn_batch_tile(n: int, frames: int, batch: int = 128,
                     iters: int = 100) -> dict:
    """Benchmark candidate tiles (wisdom-style: warmup + timed loop,
    glfft_wisdom.hpp:135-146) and return the winner record."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glava_tpu.ops import windows
    from glava_tpu.ops.pallas.fused import build_fused_update_inc

    wts = tuple(float(x) for x in windows.avg_weights(frames, True, True))
    rng = np.random.default_rng(0)
    pcm = jnp.asarray(rng.standard_normal((batch, n)).astype(np.float32) * 0.3)
    m = n // 2
    results = {}
    for bt in _CANDIDATES:
        try:
            fn = jax.jit(
                build_fused_update_inc(n, frames, wts, batch_tile=bt),
                donate_argnums=(1, 2, 3),
            )
            grav = jnp.zeros((batch, 2, m), jnp.float32)
            hist = jnp.zeros((batch, frames, 2, m), jnp.float32)
            ssum = jnp.zeros((batch, 2, m), jnp.float32)
            grav, hist, ssum = fn(pcm, grav, hist, ssum, 0, 10.2, 0.3, 0.05)
            jax.block_until_ready(ssum)
            best = float("inf")
            for _ in range(3):  # best-of-3: remote dispatch jitter
                t0 = time.perf_counter()
                for it in range(iters):
                    grav, hist, ssum = fn(pcm, grav, hist, ssum,
                                          it % frames, 10.2, 0.3, 0.05)
                jax.block_until_ready(ssum)
                best = min(best, (time.perf_counter() - t0) / iters)
            results[bt] = best
        except Exception:
            continue
    if not results:
        return {"batch_tile": DEFAULT_TILE, "us_per_iter": None}
    best = min(results, key=results.get)
    return {
        "batch_tile": best,
        "us_per_iter": round(results[best] * 1e6, 1),
        "all": {str(k): round(v * 1e6, 1) for k, v in results.items()},
    }
