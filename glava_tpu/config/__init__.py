"""Configuration engine: GLava's shader-as-config surface, evaluated.

The reference configures itself through a custom GLSL preprocessor
(glava/glsl_ext.c): ``#request`` directives mutate renderer state at
load time, ``#define`` knobs parameterize modules, ``#include`` stitches
user/system config roots, ``@name:default`` binds live stdin values and
``#RRGGBBAA`` literals are colors. Here the same language is *evaluated*
into a typed :class:`~glava_tpu.config.state.RenderConfig` plus
per-module knob environments — there is no GLSL compiler downstream,
the knobs feed jnp rasterizers directly.
"""

from glava_tpu.config.state import RenderConfig  # noqa: F401
