"""The shipped community-style example module (docs/examples/rings)
runs verbatim through the drop-in interpreter — a composite exercise
of structs, integer hash dithering, geometric builtins, mat2 rotation
and normalized-coord texture() smearing in one real module."""

import shutil
from pathlib import Path

import numpy as np
import jax.numpy as jnp

from glava_tpu.config import loader
from glava_tpu.renderer import Renderer

EXAMPLE = Path(__file__).resolve().parent.parent / "docs/examples/rings"


def _render(tmp_path, name, frags):
    mod = tmp_path / name
    mod.mkdir(parents=True, exist_ok=True)
    for i, src in enumerate(frags, start=1):
        (mod / f"{i}.frag").write_text(src)
    (tmp_path / "rc.glsl").write_text(
        f"#request mod {name}\n#request setgeometry 0 0 64 32\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n")
    lc = loader.load(user_dir=tmp_path)
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    rng = np.random.default_rng(7)
    frame = None
    for _ in range(4):
        snap = jnp.asarray(
            rng.standard_normal((2, lc.cfg.bufsize)).astype(np.float32)
            * 0.4)
        state, frame = step(state, snap, True, np.float32(0.0),
                            np.float32(1.0), np.float32(0.05), {})
    return np.asarray(frame)


def test_rings_example_renders_and_smear_is_exact(tmp_path):
    f1 = (EXAMPLE / "1.frag").read_text()
    f2 = (EXAMPLE / "2.frag").read_text()
    full = _render(tmp_path / "a", "rings", [f1, f2])
    base = _render(tmp_path / "b", "ringsbase", [f1])

    assert full.shape == (32, 64, 4)
    assert np.isfinite(full).all()
    assert full.min() >= 0.0 and full.max() <= 1.0
    lit = (full[..., 3] > 0.01).sum()
    assert lit > 20, f"ring drew only {lit} pixels"

    # pass 2 differential: out = max(p1, 0.7*left1, 0.45*left2) where
    # leftK is the pass-1 frame shifted right by K with REPEAT wrap
    # (texture() at uv.x - K/W) — np.roll IS repeat-wrap.
    want = np.maximum(
        base,
        np.maximum(0.7 * np.roll(base, 1, axis=1),
                   0.45 * np.roll(base, 2, axis=1)))
    np.testing.assert_allclose(full, want, atol=1e-6)
