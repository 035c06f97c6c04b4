"""Compatibility proof: the reference's own shipped config files load
and render through this framework unmodified.

These tests read /root/reference/shaders/glava (the upstream GLava
install tree) as the system config root; skipped when the reference
checkout isn't present.
"""

from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

REF = Path("/root/reference/shaders/glava")

pytestmark = pytest.mark.skipif(
    not REF.is_dir(), reason="reference shader tree not available"
)


def test_reference_rc_glsl_loads():
    lc = loader.load(system_dir=REF)
    cfg = lc.cfg
    assert lc.module == "bars"
    # values straight out of the reference's rc.glsl / smooth_parameters
    assert cfg.bufsize == 4096
    assert cfg.sample_rate == 22050
    assert cfg.samplesize == 1024
    assert cfg.avg_frames == 5
    assert cfg.gravity_step == pytest.approx(4.2)
    assert cfg.fft_scale == pytest.approx(10.2)
    assert cfg.fft_cutoff == pytest.approx(0.3)
    assert cfg.smooth_factor == pytest.approx(0.025)
    assert cfg.accel_fft and cfg.smooth_pass
    assert cfg.opacity == "native"
    # reference bars.glsl knobs, including the pipe-bound gradient
    assert lc.defines["BAR_WIDTH"] == "5"
    assert lc.defines["COLOR"].startswith("@fg:mix(#3366b2")


@pytest.mark.parametrize("module", ["bars", "radial", "graph", "wave", "circle"])
def test_reference_modules_load(module):
    lc = loader.load(system_dir=REF, force_module=module)
    assert lc.module == module


def test_reference_config_renders():
    lc = loader.load(system_dir=REF)
    cfg = lc.cfg
    r = Renderer(lc, screen=(192, 128))
    state = r.init_state()
    step = r.jit_step(quantize=True)
    t = np.arange(cfg.sample_rate) / cfg.sample_rate
    le = (0.4 * np.sin(2 * np.pi * 440 * t)).astype(np.float32)
    ri = (0.4 * np.sin(2 * np.pi * 3000 * t)).astype(np.float32)
    frame = None
    for k in range(20):
        end = (k + 1) * cfg.hop
        snap = np.zeros((2, cfg.bufsize), np.float32)
        for ch, b in enumerate((le, ri)):
            seg = b[max(end - cfg.bufsize, 0):end]
            snap[ch, cfg.bufsize - len(seg):] = seg
        state, frame = step(state, jnp.asarray(snap), True,
                            np.float32(0.1), np.float32(1.0),
                            np.float32(0.05), {})
    f = np.asarray(frame)
    assert (f[..., 3] > 0).any()


def test_reference_golden_entry():
    lc = loader.load(system_dir=REF, entry="test_rc.glsl")
    assert lc.module == "test"
    r, g, b, a = lc.cfg.test_eval_color
    assert r == pytest.approx(0x55 / 255)
    rend = Renderer(lc, screen=(32, 32))
    state = rend.init_state()
    step = rend.jit_step()
    snap = jnp.zeros((2, lc.cfg.bufsize), jnp.float32)
    _, frame = step(state, snap, True, np.float32(0.0), np.float32(1.0),
                    np.float32(0.05), {})
    assert rend.test_evaluate(frame)
