"""Built-in visualizer modules (reference: shaders/glava/<name>/)."""

from __future__ import annotations

from typing import Callable

from glava_tpu.render.base import ModuleBuild, ModuleContext

_STEREO_FFT = (
    ("audio_l", "audio_l", ("window", "fft", "gravity", "avg")),
    ("audio_r", "audio_r", ("window", "fft", "gravity", "avg")),
)

# module -> (builder, uniform declarations (name, source, transforms))
# mirroring each module's `#request uniform`/`#request transform` lines.
_REGISTRY: dict[str, tuple[Callable[[ModuleContext], ModuleBuild], tuple]] = {}


def register(name: str, uniforms: tuple = _STEREO_FFT):
    def deco(fn):
        _REGISTRY[name] = (fn, uniforms)
        return fn

    return deco


def build_module(name: str, ctx: ModuleContext) -> ModuleBuild:
    try:
        builder, _ = _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"module '{name}' does not exist (available: {sorted(_REGISTRY)})"
        ) from None
    return builder(ctx)


def module_uniforms(name: str) -> tuple:
    """Uniform declarations for a module's audio pipeline."""
    try:
        return _REGISTRY[name][1]
    except KeyError:
        raise KeyError(f"module '{name}' does not exist") from None


def available() -> list[str]:
    return sorted(_REGISTRY)


# import for registration side effects
from glava_tpu.render.modules import (  # noqa: E402,F401
    bars,
    circle,
    graph,
    test,
    wave,
    radial,
)
