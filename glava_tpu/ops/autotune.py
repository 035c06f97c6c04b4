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
from pathlib import Path

DEFAULT_TILE = 16  # measured best for the ring-history kernel on v5e
_CANDIDATES = (4, 8, 16, 32)

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
                     scan_len: int = 64) -> dict:
    """Benchmark candidate tiles (wisdom-style: warmup + timed loop,
    glfft_wisdom.hpp:135-146) and return the winner record.

    Timing protocol: updates are scan-amortized, completion is forced
    by fetching a scalar probe (``jax.block_until_ready`` can return
    early on the axon runtime), and per-update time is a two-point
    slope that cancels the probe-fetch RTT."""
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
            fn = build_fused_update_inc(n, frames, wts, batch_tile=bt)

            def multi(grav, hist, ssum, pcm, fn=fn):
                def body(c, k):
                    g, h, s = c
                    g, h, s = fn(
                        pcm, g, h, s,
                        jnp.mod(k, frames) * jnp.ones((batch,), jnp.int32),
                        10.2, 0.3, 0.05,
                    )
                    return (g, h, s), None
                (g, h, s), _ = jax.lax.scan(
                    body, (grav, hist, ssum), jnp.arange(scan_len)
                )
                return g, h, s, s.ravel()[0]

            f = jax.jit(multi, donate_argnums=(0, 1, 2))
            z = lambda *sh: jnp.zeros(sh, jnp.float32)
            grav, hist, ssum, probe = f(
                z(batch, 2, m), z(batch, frames, 2, m), z(batch, 2, m), pcm
            )
            float(probe)  # force compile + first execution

            def step_once():
                nonlocal grav, hist, ssum
                grav, hist, ssum, probe = f(grav, hist, z(batch, 2, m), pcm)
                return probe

            from glava_tpu.utils.timing import probed_slope

            results[bt] = probed_slope(step_once, 3, 9) / scan_len
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
