"""The per-uniform transform chain as pure functions with explicit state.

The reference mutates hidden per-transform scratch buffers each audio
update (glava/render.c:660-856, dispatched from the ``handle_audio``
closure at render.c:2113-2309). Here every stateful transform is a
``(state, x) -> (state, y)`` pure step so the whole chain jits, scans,
vmaps over a stream batch, and shards over a device mesh.

Semantics parity notes (all cited into /root/reference):

* ``window`` — a *no-op* transform name in the reference
  (``transform_functions[]`` render.c:849-856 binds it to NULL);
  actual windowing happens inside ``transform_fft`` (render.c:792-795).
* ``fft`` — window + packed-complex FFT + ``log(|v|+1)/3`` + linear
  frequency boost (render.c:783-847). The fft transform *implies*
  gravity and average (render.c:1257-1261, 2150-2155).
* ``gravity`` — peak-hold decay: ``state = max(state, x) - step/UPS``
  (CPU form render.c:720-736; GL_MAX-blend form render.c:2199-2228 —
  algebraically identical).
* ``avg`` — windowed mean over the last N updates
  (render.c:738-771; GPU variant shaders/glava/util/average_pass.frag).
* ``smooth`` — log-scale neighborhood average over the leading
  ``ceil(sz/ratio)`` entries, skipping zero samples (render.c:694-718).
* ``wrange`` — ``[-1, 1] -> [0, 1]`` (render.c:773-781).
"""

from __future__ import annotations

from functools import lru_cache
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from glava_tpu.ops import windows
from glava_tpu.ops.fft import packed_spectrum


# ---------------------------------------------------------------------------
# fft (includes windowing, magnitude, boost)
# ---------------------------------------------------------------------------

def fft_chain(x: jax.Array, fft_scale, fft_cutoff) -> jax.Array:
    """Reference ``transform_fft``: window + packed FFT + log-mag + boost.

    ``x``: (..., n) raw PCM floats. Returns (..., n) spectrum floats in
    the reference's interleaved re/im layout (render.c:783-847).
    """
    w = jnp.asarray(windows.pcm_window(x.shape[-1]))
    return packed_spectrum(x * w, fft_scale, fft_cutoff)


# ---------------------------------------------------------------------------
# gravity
# ---------------------------------------------------------------------------

def gravity_init(shape, dtype=jnp.float32) -> jax.Array:
    """Zero peak-hold state (the reference calloc's it, render.c:726)."""
    return jnp.zeros(shape, dtype)


def gravity_apply(state: jax.Array, x: jax.Array, g) -> tuple[jax.Array, jax.Array]:
    """One gravity update. ``g = gravity_step * (1 / updates_per_second)``.

    render.c:728-735: ``applied = (x >= applied ? x : applied) - g``,
    output = applied.  (Equivalently ``max(state, x) - g``.)
    """
    new = jnp.maximum(state, x) - g
    return new, new


# ---------------------------------------------------------------------------
# average
# ---------------------------------------------------------------------------

def avg_init(frames: int, shape, dtype=jnp.float32) -> jax.Array:
    """Zeroed (*batch, frames, sz) history ring, oldest-first on axis -2."""
    shape = tuple(shape)
    return jnp.zeros(shape[:-1] + (frames,) + shape[-1:], dtype)


def avg_apply(
    hist: jax.Array, x: jax.Array, weights: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Push ``x`` into the history (axis -2) and return the weighted mean.

    ``weights`` is the (frames,) vector from ``windows.avg_weights``
    (already divided by ``frames``). The reference shifts a flat
    history buffer each update (render.c:751-752); we roll the frame
    axis so the newest frame is last, matching ``bufs[tsz - sz] = b``.
    """
    hist = jnp.concatenate([hist[..., 1:, :], x[..., None, :]], axis=-2)
    w = weights.reshape((-1, 1)).astype(hist.dtype)
    return hist, jnp.sum(hist * w, axis=-2)


# ---------------------------------------------------------------------------
# smooth (the deprecated CPU 'smooth' transform, render.c:694-718)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def _smooth_mask(sz: int, ratio: float, distance: float) -> np.ndarray:
    """(asz, sz) 0/1 neighborhood mask on a log index scale.

    Row t covers source indices [floor(e^max(ln t - d, 0)),
    min(ceil(e^(ln t + d)), sz-1)] inclusive (render.c:702-707).
    Row 0 is empty (log(0) = -inf gives the range [1, 0]).
    """
    asz = int(np.ceil(sz / ratio))
    mask = np.zeros((asz, sz), dtype=np.float32)
    for t in range(1, asz):
        db = np.log(float(t))
        smin = int(np.floor(np.exp(max(db - distance, 0.0))))
        smax = min(int(np.ceil(np.exp(db + distance))), sz - 1)
        if smax >= smin:
            mask[t, smin : smax + 1] = 1.0
    return mask


def smooth_transform(x: jax.Array, ratio: float, distance: float) -> jax.Array:
    """Log-scale neighborhood average of the leading ceil(sz/ratio) bins
    — SEQUENTIAL and IN-PLACE, exactly as the reference runs it.

    render.c:694-718 overwrites ``b[t]`` while later rows still read
    ``b[s]`` for ``s <= t`` (the window's lower edge trails t by the
    e^-distance factor), so already-smoothed values feed later
    neighborhoods; zero samples are skipped (``if (b[s])``), and an
    all-zero neighborhood divides 0/0, producing a NaN that propagates
    through every later window containing it (NaN passes the zero
    check). Differentially verified against the reference's own
    compiled transform (tests/test_refdsp_differential.py). Final
    NaNs are mapped to 0 — the one documented deviation
    (docs/PARITY.md).

    Lowered as a ``lax.scan`` over the asz rows with the carry being
    the buffer itself; each step is a masked reduction over sz lanes.
    This is the deprecated CPU 'smooth' transform, not the shipped
    smooth.glsl resampler — parity outweighs throughput here.
    """
    sz = x.shape[-1]
    mask = jnp.asarray(_smooth_mask(sz, float(ratio), float(distance)))
    asz = mask.shape[0]

    def step(buf, row_t):
        row, t = row_t
        # where-selection, NOT mask multiplication: carried NaNs must
        # poison sums only when inside the window (0 * NaN is NaN, so
        # a product-mask would leak them everywhere). A NaN *inside*
        # the window passes the nonzero check like in C (NaN != 0).
        hit = (row > 0) & (buf != 0.0)
        num = jnp.sum(jnp.where(hit, buf, 0.0), axis=-1)
        den = jnp.sum(hit.astype(buf.dtype), axis=-1)
        avg = num / den  # intentional 0/0 -> NaN (reference semantics)
        return buf.at[..., t].set(avg), None

    buf, _ = jax.lax.scan(step, x, (mask, jnp.arange(asz)))
    return jnp.nan_to_num(buf, nan=0.0, posinf=jnp.inf, neginf=-jnp.inf)


# ---------------------------------------------------------------------------
# wrange
# ---------------------------------------------------------------------------

def wrange(x: jax.Array) -> jax.Array:
    """[-1, 1] -> [0, 1] (render.c:773-781)."""
    return (x + 1.0) / 2.0


# ---------------------------------------------------------------------------
# buffer decimation ('setbufscale', render.c:1765-1790)
# ---------------------------------------------------------------------------

def decimate(x: jax.Array, bufscale: int) -> jax.Array:
    """Average every ``bufscale`` consecutive samples (no-op at 1)."""
    if bufscale <= 1:
        return x
    n = (x.shape[-1] // bufscale) * bufscale
    return jnp.mean(
        x[..., :n].reshape(x.shape[:-1] + (n // bufscale, bufscale)), axis=-1
    )


# ---------------------------------------------------------------------------
# keyframe interpolation (render.c:1792-1809)
# ---------------------------------------------------------------------------

def interpolate(start: jax.Array, end: jax.Array, uratio, kcounter) -> jax.Array:
    """Linear blend between audio keyframes.

    ``mod = min(uratio * kcounter, 1)`` where ``uratio`` is the
    update:frame rate ratio and ``kcounter`` counts frames since the
    last audio update (render.c:1804-1807).
    """
    mod = jnp.minimum(uratio * kcounter, 1.0)
    return start + (end - start) * mod


# ---------------------------------------------------------------------------
# composed per-uniform chain state
# ---------------------------------------------------------------------------

class ChainState(NamedTuple):
    """Carry for one audio uniform's implied fft dynamics."""

    gravity: jax.Array  # (*batch, sz)
    history: jax.Array  # (*batch, frames, sz)


def chain_init(sz: int, avg_frames: int, batch: tuple[int, ...] = ()) -> ChainState:
    return ChainState(
        gravity=jnp.zeros(batch + (sz,), jnp.float32),
        history=jnp.zeros(batch + (avg_frames, sz), jnp.float32),
    )


def fft_update(
    state: ChainState,
    pcm: jax.Array,
    *,
    fft_scale,
    fft_cutoff,
    gravity_g,
    avg_weights: jax.Array,
    texture_clamp: bool = True,
) -> tuple[ChainState, jax.Array]:
    """One full audio update: fft -> implied gravity -> implied avg.

    Mirrors the transform dispatch at render.c:2128-2160 for the
    standard module chain (window/fft/gravity/avg). Works batched over
    any leading stream axes.

    ``texture_clamp`` models the default (accel) path's GL_R16
    unsigned-normalized stages (render.c:512-523, 1707-1719): every
    stage's output — including the gravity peak-hold store — is
    clamped to [0, 1] on write. The CPU path clamps only at the final
    texture upload, letting the gravity carry go negative
    (render.c:730-735).
    """
    gravity_g = jnp.asarray(gravity_g)
    if gravity_g.ndim:  # per-stream (S,) decay -> broadcast over bins
        gravity_g = gravity_g[..., None]
    spec = fft_chain(pcm, fft_scale, fft_cutoff)
    if texture_clamp:
        spec = jnp.clip(spec, 0.0, 1.0)
        grav = jnp.clip(jnp.maximum(state.gravity, spec) - gravity_g, 0.0, 1.0)
        out = grav
    else:
        grav, out = gravity_apply(state.gravity, spec, gravity_g)
    hist, out = avg_apply(state.history, out, avg_weights)
    if texture_clamp:
        out = jnp.clip(out, 0.0, 1.0)
    return ChainState(gravity=grav, history=hist), out
