"""`test` module: the golden-frame CI fixture.

Mirrors shaders/glava/test/{1,2,3}.frag: pass 1 exercises the full
uniform/transform surface (it samples both audio textures so the whole
pipeline traces) and emits the constant ``vec4(1, 0, 0, 1/3)``;
pass 2 verifies prev-chaining by passing the frame through; pass 3 is
the premultiply include. With ``settesteval 55000055``
(test_rc.glsl:27) the harness asserts every output pixel equals the
premultiplied constant within +-0.5/255 (render.c:2419-2453).
"""

from __future__ import annotations

import jax.numpy as jnp

from glava_tpu.render import base
from glava_tpu.render.modules import register


@register("test")
def build(ctx: base.ModuleContext) -> base.ModuleBuild:
    def pass1(inputs: base.PassInputs) -> base.Planes:
        # touch both textures like test/1.frag's dummy smooth_audio
        # calls, so the full transform chain stays live in the graph
        tl = inputs.textures["audio_l"]
        tr = inputs.textures["audio_r"]
        dummy = (jnp.sum(tl) + jnp.sum(tr)) * 0.0
        return tuple(
            jnp.float32(c) + dummy for c in (1.0, 0.0, 0.0, 1.0 / 3.0)
        )

    def pass2(inputs: base.PassInputs) -> base.Planes:
        return inputs.prev  # test/2.frag: texelFetch pass-through

    passes = [pass1, pass2]
    if ctx.cfg.premultiply_alpha:
        passes.append(base.premultiply_pass)  # test/3.frag
    return base.ModuleBuild("test", passes)
