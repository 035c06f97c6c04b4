"""Kernel autotuning ("wisdom") — the GLFFT wisdom equivalent.

The reference's GLFFT library benchmarks workgroup/vector/shared-memory
variants per FFT size and serializes the winners to JSON
(glfft/glfft_wisdom.cpp, learn_optimal_options at glfft_wisdom.hpp:94,
JSON IO at glfft_wisdom.hpp:119-123). Two tunables here, both persisted
to ``~/.cache/glava_tpu/wisdom.json`` keyed by device kind and problem
shape:

* the fused Pallas kernel's **batch tile** (VMEM residency vs grid
  parallelism) — :func:`best_batch_tile`;
* the **update-path choice** itself — XLA-fused chain vs the
  hand-written Pallas kernel — measured head-to-head on the pipeline's
  real update step (:func:`learn_path`) and consulted by
  ``AudioPipeline.__init__`` via :func:`selected_path`. This mirrors
  how GLFFT's wisdom governs the pipeline that actually runs
  (glfft_wisdom.hpp:91-146), not an opt-in variant.

Tuning is opt-in (`learn=True` or the `glava-tpu-bench --tune` flag);
without a cache entry measured defaults are used (XLA path, tile 16 —
best on TPU v5e for the shipped buffer sizes).
"""

from __future__ import annotations

import json
import os
from pathlib import Path

DEFAULT_TILE = 16       # measured best for the ring-history kernel on v5e
DEFAULT_MEGACORE = True  # ~1% at best (DMA-bound kernel) but never worse
# (batch_tile, megacore-parallel grid) search space; bt=32 exceeds this
# environment's remote-compile limits and is skipped gracefully
_CANDIDATES = tuple((bt, mc) for bt in (4, 8, 16, 32)
                    for mc in (False, True))

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


def best_batch_tile(n: int, frames: int,
                    learn: bool = False) -> tuple[int, bool]:
    """(batch_tile, megacore) for the fused kernel at this shape."""
    cache = _load()
    key = _key(n, frames)
    if key in cache:
        rec = cache[key]
        return (int(rec["batch_tile"]),
                bool(rec.get("megacore", DEFAULT_MEGACORE)))
    if not learn:
        return DEFAULT_TILE, DEFAULT_MEGACORE
    result = learn_batch_tile(n, frames)
    cache[key] = result
    _save(cache)
    return (int(result["batch_tile"]),
            bool(result.get("megacore", DEFAULT_MEGACORE)))


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
    for bt, mega in _CANDIDATES:
        try:
            fn = build_fused_update_inc(n, frames, wts, batch_tile=bt,
                                        megacore=mega)

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

            results[(bt, mega)] = probed_slope(step_once, 3, 9) / scan_len
        except Exception:
            continue
    if not results:
        return {"batch_tile": DEFAULT_TILE, "megacore": DEFAULT_MEGACORE,
                "us_per_iter": None}
    best = min(results, key=results.get)
    return {
        "batch_tile": best[0],
        "megacore": best[1],
        "us_per_iter": round(results[best] * 1e6, 1),
        "all": {f"bt{k[0]}_mc{int(k[1])}": round(v * 1e6, 1)
                for k, v in results.items()},
    }


# ---------------------------------------------------------------------------
# Path-selection wisdom: XLA-fused chain vs hand-written Pallas kernel
# ---------------------------------------------------------------------------

DEFAULT_PATH = "xla"  # round-2 measurement: 81 vs 159 us per 64-stream update


def _path_key(n: int, frames: int, streams: int) -> str:
    import jax

    dev = jax.devices()[0]
    return f"{dev.device_kind}/path/n{n}/f{frames}/s{streams}"


def selected_path(n: int, frames: int, streams: int = 64) -> dict:
    """Consult the persisted path choice for this shape (no measuring).

    Falls back to any tuned entry for the same (n, frames) at another
    stream count, then to the measured default. The returned record
    carries the measurements that justified the choice (for bench
    reporting)."""
    cache = _load()
    rec = cache.get(_path_key(n, frames, streams))
    if isinstance(rec, dict) and "path" in rec:
        return rec
    try:
        import jax

        dev = jax.devices()[0].device_kind
        prefix = f"{dev}/path/n{n}/f{frames}/"
        for k in sorted(cache):
            if k.startswith(prefix) and isinstance(cache[k], dict) \
                    and "path" in cache[k]:
                return cache[k]
    except Exception:
        pass
    return {"path": DEFAULT_PATH, "source": "default"}


def learn_path(n: int, frames: int, streams: int = 64,
               scan_len: int = 32) -> dict:
    """Measure the REAL pipeline update step (advance + texture
    materialization, both uniforms, shipped smooth pass) on the XLA
    chain vs the Pallas fused kernel, pick the winner, persist it.

    The Pallas side first (re)tunes its batch tile so the comparison is
    against the kernel's best configuration — the same two-stage search
    GLFFT wisdom runs (options per radix, then the radix plan,
    glfft.cpp:107-353). Honest protocol throughout: scan-amortized,
    fresh audio per iteration, scalar-probe completion, two-point
    slopes (utils/timing.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from glava_tpu.config.state import RenderConfig
    from glava_tpu.pipeline import AudioPipeline, UniformSpec
    from glava_tpu.utils.timing import probed_slope

    if jax.default_backend() != "tpu":
        raise RuntimeError(
            "path wisdom must be learned on the TPU backend "
            f"(current: {jax.default_backend()})"
        )

    # stage 1: make sure the Pallas kernel competes at its best tile
    cache = _load()
    tile_key = _key(n, frames)
    cache[tile_key] = learn_batch_tile(n, frames, batch=2 * streams)
    _save(cache)

    cfg = RenderConfig(bufsize=n, samplesize=max(n // 4, 256),
                       avg_frames=frames)
    chain = ("window", "fft", "gravity", "avg")
    uniforms = [UniformSpec("audio_l", "audio_l", chain),
                UniformSpec("audio_r", "audio_r", chain)]
    rng = np.random.default_rng(0)
    audio = jnp.asarray(
        rng.standard_normal((streams, 2, n)).astype(np.float32) * 0.3
    )
    g = jnp.full((streams,), 0.05, jnp.float32)

    results: dict[str, float] = {}
    for name, use_fused in (("xla", False), ("pallas", True)):
        try:
            pipe = AudioPipeline(cfg, uniforms, use_fused=use_fused)

            def multi(chains, audio, g, pipe=pipe):
                def body(c, k):
                    a = audio * (1.0 + 1e-3 * k)
                    c = pipe.advance(c, a[:, 0, :], a[:, 1, :], gravity_g=g)
                    return c, None

                chains, _ = jax.lax.scan(
                    body, chains, jnp.arange(scan_len, dtype=jnp.float32))
                tex = pipe.textures_from(chains, audio[:, 0, :],
                                         audio[:, 1, :])
                probe = sum(t.ravel()[0] for t in tex.values())
                return chains, probe

            f = jax.jit(multi, donate_argnums=(0,))
            chains = pipe.init_state(batch=(streams,))
            chains, probe = f(chains, audio, g)
            float(probe)  # compile + first real execution

            def once():
                nonlocal chains
                chains, probe = f(chains, audio, g)
                return probe

            results[name] = probed_slope(once, 3, 9) / scan_len
        except Exception as e:
            import sys

            print(f"path candidate {name!r} failed: {e}", file=sys.stderr)
            continue

    if not results:
        return {"path": DEFAULT_PATH, "source": "default"}
    best = min(results, key=results.get)
    rec = {
        "path": best,
        "source": "measured",
        "streams": streams,
        "us_per_update": {k: round(v * 1e6, 1) for k, v in results.items()},
        "batch_tile": cache[tile_key].get("batch_tile", DEFAULT_TILE),
    }
    cache[_path_key(n, frames, streams)] = rec
    _save(cache)
    return rec


# ---------------------------------------------------------------------------
# Presmooth-resample wisdom: dense matmul vs block-banded einsum
# ---------------------------------------------------------------------------

BANDED_TILES = (64, 128, 256)


def _banded_key(sz: int) -> str:
    import jax

    dev = jax.devices()[0]
    return f"{dev.device_kind}/banded/sz{sz}"


def selected_banded(sz: int) -> dict | None:
    """Persisted dense-vs-banded choice for this presmooth size (no
    measuring); None when untuned (callers fall back to the band-size
    heuristic)."""
    try:
        rec = _load().get(_banded_key(sz))
    except Exception:
        return None
    if isinstance(rec, dict) and "mode" in rec:
        return rec
    return None


def learn_banded(sz: int, streams: int = 64, scan_len: int = 16) -> dict:
    """Measure the average-mode presmooth resample as a dense matmul
    vs the block-banded einsum at each candidate tile, on the real
    (streams, sz) update shapes, and persist the winner — the
    dense<->banded crossover and block size join the wisdom search
    (GLFFT wisdom's role, glfft_wisdom.hpp:91-146).

    The dense candidate can legitimately FAIL to compile at huge sizes
    (the 16384 matrix is a ~300 MB HLO constant that exceeds
    remote-compile request limits); a failure simply removes it from
    the race."""

    import jax
    import jax.numpy as jnp
    import numpy as np

    from glava_tpu.ops import smoothing
    from glava_tpu.utils.timing import probed_slope

    if jax.default_backend() != "tpu":
        raise RuntimeError(
            "banded wisdom must be learned on the TPU backend "
            f"(current: {jax.default_backend()})"
        )
    params = smoothing.SmoothParams()
    pos = np.arange(sz, dtype=np.float64) / sz
    rng = np.random.default_rng(0)
    tex = jnp.asarray(
        rng.standard_normal((streams, sz)).astype(np.float32) * 0.1)

    results: dict[str, float] = {}
    cands = [("dense", 0)] + [("banded", t) for t in BANDED_TILES]
    for mode, tile in cands:
        name = mode if mode == "dense" else f"banded{tile}"
        try:
            op = smoothing.build_resample(
                sz, pos, params, banded=(mode == "banded"),
                banded_tile=tile or None)

            def many(t, op=op):
                def body(acc, k):
                    return acc + op(t * (1.0 + 1e-3 * k)).sum(), None

                acc, _ = jax.lax.scan(
                    body, jnp.float32(0.0),
                    jnp.arange(scan_len, dtype=jnp.float32))
                return acc

            f = jax.jit(many)
            float(f(tex))

            def once():
                return f(tex)

            results[name] = probed_slope(once, 3, 9) / scan_len
        except Exception as e:
            import sys

            print(f"banded candidate {name!r} failed: {e}",
                  file=sys.stderr)
            continue

    if not results:
        raise RuntimeError("every banded candidate failed")
    best = min(results, key=results.get)
    rec = {
        "mode": "dense" if best == "dense" else "banded",
        "tile": 128 if best == "dense" else int(best[len("banded"):]),
        "source": "measured",
        "streams": streams,
        "us_per_apply": {k: round(v * 1e6, 1) for k, v in results.items()},
    }
    cache = _load()
    cache[_banded_key(sz)] = rec
    _save(cache)
    return rec
