#!/usr/bin/env python
"""Regenerate the docs/images module samples (white-composited PNGs)."""

import sys

sys.path.insert(0, ".")


def main() -> None:
    import jax

    if jax.default_backend() != "tpu":
        jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    from glava_tpu.config import loader
    from glava_tpu.renderer import Renderer
    from glava_tpu.runtime.sinks import write_png

    def drive(module, screen, freqs=(440.0, 3000.0)):
        lc = loader.load(
            cli_requests=(f"setgeometry 0 0 {screen[0]} {screen[1]}",
                          "setprintframes false"),
            force_module=module,
        )
        r = Renderer(lc)
        cfg = r.cfg
        t = np.arange(cfg.sample_rate) / cfg.sample_rate
        le = (0.4 * np.sin(2 * np.pi * freqs[0] * t)
              + 0.15 * np.sin(2 * np.pi * freqs[0] * 2.7 * t)).astype(np.float32)
        ri = (0.4 * np.sin(2 * np.pi * freqs[1] * t)
              + 0.15 * np.sin(2 * np.pi * freqs[1] * 0.4 * t)).astype(np.float32)
        state, step = r.init_state(), r.jit_step(quantize=True)
        g = np.float32(cfg.gravity_step / cfg.nominal_ups)
        frame = None
        for k in range(30):
            end = (k + 1) * cfg.hop
            snap = np.zeros((2, cfg.bufsize), np.float32)
            for ch, b in enumerate((le, ri)):
                seg = b[max(end - cfg.bufsize, 0):end]
                snap[ch, cfg.bufsize - len(seg):] = seg
            state, frame = step(state, jnp.asarray(snap), True,
                                np.float32(k / 60), np.float32(1.0), g, {})
        return np.asarray(frame)

    for mod, scr in [("bars", (512, 256)), ("radial", (400, 400)),
                     ("graph", (512, 256)), ("wave", (512, 256)),
                     ("circle", (400, 400))]:
        f = drive(mod, scr)
        rgb = f[..., :3].astype(np.float32)
        a = f[..., 3:4].astype(np.float32) / 255.0
        img = np.clip(rgb + 255.0 * (1 - a), 0, 255).astype(np.uint8)
        out = np.concatenate([img, np.full_like(f[..., :1], 255)], axis=-1)
        write_png(f"docs/images/{mod}.png", out)
        print(f"{mod}: drawn {(f[..., 3] > 0).mean():.1%}")


if __name__ == "__main__":
    main()
