"""Example user module: a stereo VU meter.

Install into your config root and select it:

    mkdir -p ~/.config/glava_tpu/modules
    cp docs/examples/vu_meter.py ~/.config/glava_tpu/modules/
    glava-tpu -m vu_meter

Optionally create ~/.config/glava_tpu/vu_meter.glsl with knob
overrides:

    #define METER_COLOR #22cc44
    #define PEAK_COLOR  #cc2222
    #define AMPLIFY 400

A module registers a builder producing pass functions over
(H, W, 4) float RGBA frames (row 0 at the bottom); spectrum textures
arrive per declared uniform. See glava_tpu/render/modules/bars.py for
the full pattern.
"""

import jax.numpy as jnp
import numpy as np

from glava_tpu.config import glsl_expr
from glava_tpu.render import base
from glava_tpu.render.modules import register


@register(
    "vu_meter",
    uniforms=(
        ("audio_l", "audio_l", ("window", "fft", "gravity", "avg")),
        ("audio_r", "audio_r", ("window", "fft", "gravity", "avg")),
    ),
)
def build(ctx: base.ModuleContext) -> base.ModuleBuild:
    w, h = ctx.screen
    amplify = ctx.knob_f("AMPLIFY", 400)
    meter = glsl_expr.to_rgba(
        ctx.color_fn("METER_COLOR")() if "METER_COLOR" in ctx.env.defines
        else (0.13, 0.8, 0.27, 1.0)
    )
    peak = glsl_expr.to_rgba(
        ctx.color_fn("PEAK_COLOR")() if "PEAK_COLOR" in ctx.env.defines
        else (0.8, 0.13, 0.13, 1.0)
    )

    # sample a broad band of the smoothed spectrum per channel
    positions = np.linspace(0.05, 0.95, 32)
    sample = ctx.sampler(positions)
    y = np.arange(h, dtype=np.float32) + 0.5

    def pass1(inputs: base.PassInputs) -> jnp.ndarray:
        level_l = jnp.mean(sample(inputs.textures["audio_l"])) * amplify
        level_r = jnp.mean(sample(inputs.textures["audio_r"])) * amplify
        rows = jnp.asarray(y)[:, None]                       # (H, 1)
        col = jnp.arange(w)[None, :]                         # (1, W)
        left_half = col < (w // 2)
        level = jnp.where(left_half, level_l, level_r)       # (1->H, W)
        lit = rows < level
        hot = rows > (0.8 * level)
        color = jnp.where((lit & hot)[..., None], peak,
                          jnp.where(lit[..., None], meter, 0.0))
        return color.astype(jnp.float32)

    return base.ModuleBuild("vu_meter", [pass1])
