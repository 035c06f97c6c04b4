"""AudioPipeline: PCM windows -> per-uniform spectrum textures.

This is the device-side "update" half of the reference's frame loop
(the ``handle_audio`` closure, glava/render.c:2113-2309): for every
audio uniform a module binds, apply its declared transform chain and
produce the 1-D texture the rasterizer samples. Stateful dynamics
(gravity peak-hold, N-frame averaging) are carried explicitly so the
whole update jits and batches.

Chain semantics (render.c:849-856, 1256-1284, 2128-2160):

* ``window``   — registered no-op (windowing lives inside ``fft``).
* ``fft``      — window + packed FFT + log-mag + boost, then *implied*
                 gravity and average, in that order.
* ``gravity``/``avg`` — deprecated no-op names (implied by fft).
* ``smooth``   — log-scale neighborhood average (deprecated CPU path).
* ``wrange``   — [-1,1] -> [0,1].

After the chain, the default configuration applies the smooth *pass*
(render.c:2276-2303): a log-frequency resample of the texture onto
itself, baked here as a precomputed matrix operator.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from glava_tpu.config.state import RenderConfig
from glava_tpu.ops import smoothing, transforms, windows


@dataclass(frozen=True)
class UniformSpec:
    """One audio uniform binding and its transform chain.

    Mirrors ``#request uniform "audio_l" name`` + ``#request transform
    name "fft"`` declarations in module pass sources
    (e.g. shaders/glava/bars/1.frag:12-24).
    """

    name: str                      # uniform name in the module ("audio_l")
    source: str                    # "audio_l" | "audio_r"
    transforms: tuple[str, ...]    # declared chain, reference names


_KNOWN_TRANSFORMS = {"window", "fft", "wrange", "avg", "gravity", "smooth"}


def _has_fft(chain: tuple[str, ...]) -> bool:
    return "fft" in chain


class AudioPipeline:
    """Builds the jittable update step for a set of uniform chains."""

    def __init__(self, cfg: RenderConfig, uniforms: list[UniformSpec]):
        for u in uniforms:
            unknown = set(u.transforms) - _KNOWN_TRANSFORMS
            if unknown:
                raise ValueError(
                    f"transform function does not exist: {sorted(unknown)!r}"
                )
        self.cfg = cfg
        self.uniforms = list(uniforms)
        self.sz = cfg.scaled_bufsize
        self.avg_weights = jnp.asarray(
            windows.avg_weights(cfg.avg_frames, cfg.avg_window, cfg.accel_fft)
        )
        self.smooth_params = smoothing.SmoothParams(factor=cfg.smooth_factor)
        self.presmooth = (
            smoothing.presmooth_op(self.sz, self.smooth_params)
            if cfg.smooth_pass
            else None
        )

    # -- state ----------------------------------------------------------

    def init_state(self, batch: tuple[int, ...] = ()) -> dict[str, Any]:
        state: dict[str, Any] = {}
        for u in self.uniforms:
            if _has_fft(u.transforms):
                state[u.name] = transforms.chain_init(
                    self.sz, self.cfg.avg_frames, batch
                )
        return state

    # -- one audio update -------------------------------------------------

    def update(
        self,
        state: dict[str, Any],
        audio_l: jax.Array,
        audio_r: jax.Array,
        *,
        fft_scale=None,
        fft_cutoff=None,
        gravity_g=None,
    ) -> tuple[dict[str, Any], dict[str, jax.Array]]:
        """Apply every uniform's chain to the current ring snapshot.

        ``audio_l``/``audio_r``: (..., bufsize) ring copies (newest
        samples at the end, as maintained by the capture backends).
        Returns new state and the texture dict keyed by uniform name.
        """
        cfg = self.cfg
        fft_scale = cfg.fft_scale if fft_scale is None else fft_scale
        fft_cutoff = cfg.fft_cutoff if fft_cutoff is None else fft_cutoff
        if gravity_g is None:
            gravity_g = cfg.gravity_step / cfg.nominal_ups

        audio_l = transforms.decimate(audio_l, cfg.bufscale)
        audio_r = transforms.decimate(audio_r, cfg.bufscale)
        sources = {"audio_l": audio_l, "audio_r": audio_r}

        new_state = dict(state)
        textures: dict[str, jax.Array] = {}
        for u in self.uniforms:
            buf = sources[u.source]
            for t in u.transforms:
                if t == "fft":
                    st = state[u.name]
                    st, buf = transforms.fft_update(
                        st,
                        buf,
                        fft_scale=fft_scale,
                        fft_cutoff=fft_cutoff,
                        gravity_g=gravity_g,
                        avg_weights=self.avg_weights,
                        texture_clamp=cfg.accel_fft,
                    )
                    new_state[u.name] = st
                elif t == "wrange":
                    buf = transforms.wrange(buf)
                elif t == "smooth":
                    buf = transforms.smooth_transform(
                        buf, cfg.smooth_ratio, cfg.smooth_distance
                    )
                # window / gravity / avg: no-op names (see module docstring)
            # Texture upload: all 1-D audio textures are GL_R16 unsigned
            # normalized (render.c:512-523), so sampled values are
            # clamped to [0, 1] regardless of path.
            buf = jnp.clip(buf, 0.0, 1.0)
            if self.presmooth is not None and _has_fft(u.transforms):
                buf = jnp.clip(self.presmooth(buf), 0.0, 1.0)
            textures[u.name] = buf
        return new_state, textures

    # -- convenience: jitted closure ---------------------------------------

    def jit_update(self):
        def step(state, audio_l, audio_r, fft_scale, fft_cutoff, gravity_g):
            return self.update(
                state,
                audio_l,
                audio_r,
                fft_scale=fft_scale,
                fft_cutoff=fft_cutoff,
                gravity_g=gravity_g,
            )

        return jax.jit(step, donate_argnums=(0,))


def frame_windows(pcm: np.ndarray, bufsize: int, hop: int) -> np.ndarray:
    """Host-side helper: slice a PCM track into overlapping ring snapshots.

    Emulates the capture ring (fifo.c:91-110): window ``k`` holds the
    ``bufsize`` samples ending at ``(k + 1) * hop``, zero-padded on the
    left before enough history accumulates. Returns (n_windows, bufsize).
    """
    n = len(pcm)
    count = max(n // hop, 0)
    out = np.zeros((count, bufsize), dtype=np.float32)
    for k in range(count):
        end = (k + 1) * hop
        start = max(end - bufsize, 0)
        seg = pcm[start:end]
        out[k, bufsize - len(seg):] = seg
    return out
