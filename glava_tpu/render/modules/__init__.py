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


def _resolve(name: str, overrides: dict | None):
    if overrides and name in overrides:
        return overrides[name]
    try:
        return _REGISTRY[name]
    except KeyError:
        avail = sorted(set(_REGISTRY) | set(overrides or ()))
        raise KeyError(
            f"module '{name}' does not exist (available: {avail})"
        ) from None


def build_module(name: str, ctx: ModuleContext,
                 overrides: dict | None = None) -> ModuleBuild:
    builder, _ = _resolve(name, overrides)
    return builder(ctx)


def module_uniforms(name: str, overrides: dict | None = None) -> tuple:
    """Uniform declarations for a module's audio pipeline."""
    return _resolve(name, overrides)[1]


def load_user_modules(user_dir) -> list[str]:
    """Discover user Python modules: ``<user_dir>/modules/<name>.py``.

    The extensibility story of the reference's module system (users
    drop shader directories into their config root,
    render.c:1488-1597) — here a user module is a Python file calling
    :func:`register`, with knobs still coming from an optional
    ``<name>.glsl`` next to it. Returns the names loaded.
    """
    import importlib.util
    from pathlib import Path

    if user_dir is None:
        return []
    mdir = Path(user_dir) / "modules"
    if not mdir.is_dir():
        return []
    loaded = []
    for py in sorted(mdir.glob("*.py")):
        before = set(_REGISTRY)
        spec = importlib.util.spec_from_file_location(
            f"glava_tpu_user_module_{py.stem}", py
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        loaded.extend(sorted(set(_REGISTRY) - before))
    return loaded


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
