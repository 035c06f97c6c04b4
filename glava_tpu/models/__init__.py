"""Model families — alias package.

The framework's "models" are its visualizer modules (the reference's
shader module families, SURVEY.md LX layer): bars, radial, graph, wave,
circle, the `test` CI fixture, plus user Python modules. They live in
:mod:`glava_tpu.render.modules`; this package re-exports the registry
for discoverability alongside `ops/` and `parallel/`.

The audio-feature "model" (Whisper-style log-mel frontend) lives in
:mod:`glava_tpu.ops.mel`.
"""

from glava_tpu.render.modules import (  # noqa: F401
    available,
    build_module,
    load_user_modules,
    module_uniforms,
    register,
)
