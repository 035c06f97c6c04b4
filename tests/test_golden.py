"""Golden-frame regression tests.

The reference's only test is a golden full-pipeline frame
(SURVEY.md section 4); beyond the constant-color `test` module we pin
every real module's output on a deterministic input. Goldens are
generated on CPU with `python tests/test_golden.py regen` and compared
with a small uint8 tolerance (covers backend math drift while catching
semantic regressions).
"""

from __future__ import annotations

import sys
from pathlib import Path

import numpy as np
import pytest
import jax.numpy as jnp

GOLDEN = Path(__file__).parent / "golden" / "frames.npz"

CASES = {
    "bars": (192, 128),
    "radial": (300, 300),
    "graph": (192, 128),
    "wave": (192, 128),
    "circle": (300, 300),
}

# Tiny-frame pins (the multichip serving dryrun's geometry): every
# module must draw visibly at 64x64 (render.c:1488-1597 stages always
# draw) — radial/circle need their ring radius inside the frame, via
# the user knob-file override path, exactly like __graft_entry__'s
# fleet dryrun.
TINY_SCREEN = (64, 64)
TINY_KNOBS = {
    "radial": "#define C_RADIUS 12\n#define NBARS 32\n",
    "circle": "#define C_RADIUS 12\n",
}


def render_case(module: str, screen, tiny: bool = False) -> np.ndarray:
    import tempfile

    from glava_tpu.config import loader
    from glava_tpu.renderer import Renderer

    reqs = (f"setgeometry 0 0 {screen[0]} {screen[1]}",
            "setprintframes false")
    kwargs = {}
    td = None
    if tiny:
        reqs += ("setbufsize 256", "setsamplesize 64")
        if module in TINY_KNOBS:
            td = tempfile.TemporaryDirectory()
            (Path(td.name) / f"{module}.glsl").write_text(TINY_KNOBS[module])
            kwargs["user_dir"] = td.name
    lc = loader.load(
        cli_requests=reqs,
        force_module=module,
        **kwargs,
    )
    if td is not None:
        td.cleanup()
    r = Renderer(lc)
    cfg = lc.cfg
    t = np.arange(cfg.sample_rate) / cfg.sample_rate
    le = (0.4 * np.sin(2 * np.pi * 440.0 * t)).astype(np.float32)
    ri = (0.4 * np.sin(2 * np.pi * 3000.0 * t)).astype(np.float32)
    state = r.init_state()
    step = r.jit_step(quantize=True)
    g = np.float32(cfg.gravity_step / cfg.nominal_ups)
    frame = None
    for k in range(24):
        end = (k + 1) * cfg.hop
        snap = np.zeros((2, cfg.bufsize), np.float32)
        for ch, b in enumerate((le, ri)):
            seg = b[max(end - cfg.bufsize, 0):end]
            snap[ch, cfg.bufsize - len(seg):] = seg
        state, frame = step(state, jnp.asarray(snap), True,
                            np.float32(0.25), np.float32(1.0), g, {})
    return np.asarray(frame)


@pytest.mark.parametrize("module", sorted(CASES))
def test_golden_frame(module):
    if not GOLDEN.exists():
        pytest.skip("no golden archive; run `python tests/test_golden.py regen`")
    data = np.load(GOLDEN)
    want = data[module]
    got = render_case(module, CASES[module])
    assert got.shape == want.shape
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    # tolerance: tiny quantization drift allowed, structure must match
    assert float((diff > 2).mean()) < 0.002, (
        f"{module}: {(diff > 2).mean():.4%} of pixels deviate, max {diff.max()}"
    )


@pytest.mark.parametrize("module", sorted(CASES))
def test_golden_frame_tiny(module):
    """64x64 pins for every module — the multichip dryrun's frame size.
    Catches 'module blank at small geometry' regressions on CPU."""
    if not GOLDEN.exists():
        pytest.skip("no golden archive; run `python tests/test_golden.py regen`")
    data = np.load(GOLDEN)
    key = f"{module}_tiny"
    if key not in data:
        pytest.skip(f"{key} missing; run `python tests/test_golden.py regen`")
    want = data[key]
    got = render_case(module, TINY_SCREEN, tiny=True)
    assert got.shape == want.shape
    assert (got[..., 3] > 0).any(), f"{module} drew nothing at 64x64"
    diff = np.abs(got.astype(np.int16) - want.astype(np.int16))
    assert float((diff > 2).mean()) < 0.002, (
        f"{module}: {(diff > 2).mean():.4%} of pixels deviate, max {diff.max()}"
    )


def regen() -> None:
    """Regenerate the archive. Existing keys are kept VERBATIM (goldens
    are regression pins — regenerating them would silently move the
    pin); only missing keys are rendered. Delete frames.npz first to
    re-pin everything."""
    GOLDEN.parent.mkdir(parents=True, exist_ok=True)
    frames: dict[str, np.ndarray] = {}
    if GOLDEN.exists():
        with np.load(GOLDEN) as data:
            frames.update({k: data[k] for k in data.files})
    for m, s in CASES.items():
        if m not in frames:
            frames[m] = render_case(m, s)
        if f"{m}_tiny" not in frames:
            frames[f"{m}_tiny"] = render_case(m, TINY_SCREEN, tiny=True)
    np.savez_compressed(GOLDEN, **frames)
    for m, f in frames.items():
        print(f"{m}: {f.shape} drawn={(f[..., 3] > 0).mean():.2%}")
    print(f"wrote {GOLDEN}")


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "regen":
        # goldens are CPU-generated; outside pytest the conftest CPU
        # forcing doesn't run (and the axon plugin ignores the
        # JAX_PLATFORMS env var — CLAUDE.md gotchas)
        import jax

        jax.config.update("jax_platforms", "cpu")
        regen()
    else:
        print("usage: python tests/test_golden.py regen")
