"""glava_tpu — a TPU-native audio-spectrum-visualizer framework.

A ground-up JAX/XLA/Pallas re-design of the capabilities of GLava
(jarcode-foss/glava): PCM audio capture -> windowed real spectrum ->
visual dynamics (gravity decay, frame averaging, log-frequency
smoothing) -> RGBA frame rasterization, with GLava's module/request
configuration surface.

Unlike the reference (a C11/OpenGL desktop application), everything on
the compute path here is expressed as batched, statically-shaped JAX
programs: the FFT is performed as batched matrix multiplications on the
MXU (four-step Cooley-Tukey), log-frequency smoothing is a precomputed
resample matrix, per-frame visual state (gravity / averaging /
interpolation) is an explicit functional carry, and many independent
audio streams batch onto one chip via vmap and shard across chips via
``jax.sharding``.

Reference layer map: see SURVEY.md section 1 (citing /root/reference).
"""

__version__ = "0.1.0"

from glava_tpu.config.state import RenderConfig  # noqa: F401
from glava_tpu.pipeline import AudioPipeline  # noqa: F401

__all__ = [
    "RenderConfig",
    "AudioPipeline",
    "__version__",
]
