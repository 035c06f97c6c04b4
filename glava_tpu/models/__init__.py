"""Audio-feature model frontends.

The framework's visualizer "model families" (bars/radial/graph/wave/
circle, SURVEY.md LX layer) live in :mod:`glava_tpu.render.modules`;
this package hosts the *feature* models built on the same FFT kernel —
currently the Whisper-style log-mel frontend (:mod:`glava_tpu.models.mel`,
BASELINE config #5)."""

from glava_tpu.models import mel  # noqa: F401
