"""FleetEngine tests: multi-stream serving with per-stream everything."""

import numpy as np

from glava_tpu.config import loader
from glava_tpu.runtime.fleet import FleetEngine, StreamSpec


def _loaded():
    return loader.load(
        cli_requests=("setgeometry 0 0 96 64", "setprintframes false",
                      "setbufsize 1024", "setsamplesize 256"),
    )


def test_fleet_per_stream_sources_and_colors():
    streams = [
        StreamSpec("a", source="synth:300,900",
                   pipe={"fg": (1, 0, 0, 1), "bg": (0, 0, 0, 0)}),
        StreamSpec("b", source="synth:noise",
                   pipe={"fg": (0, 0, 1, 1), "bg": (0, 0, 0, 0)}),
    ]
    f = FleetEngine(_loaded(), streams)
    f.run(max_seconds=2.5)
    fa, fb = f.tex(0), f.tex(1)
    assert fa is not None and fb is not None
    da = fa[fa[..., 3] > 0]
    db = fb[fb[..., 3] > 0]
    assert da.size and db.size
    assert da[:, :3].mean(axis=0).argmax() == 0  # red stream
    assert db[:, :3].mean(axis=0).argmax() == 2  # blue stream
    assert not np.array_equal(fa, fb)


def test_fleet_live_pipe_update():
    streams = [StreamSpec("a", source="synth:500,1500",
                          pipe={"fg": (1, 0, 0, 1), "bg": (0, 0, 0, 0)})]
    f = FleetEngine(_loaded(), streams)
    f.set_pipe(0, "fg", (0, 1, 0, 1))
    f.run(max_seconds=2.0)
    fr = f.tex(0)
    drawn = fr[fr[..., 3] > 0]
    assert drawn.size
    assert drawn[:, 1].min() == 255  # updated to green before run


def test_fleet_on_device_mesh():
    """Sharded fleet: streams over the mesh data axis, rows spatial."""
    import jax

    from glava_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], rows=2)
    streams = [
        StreamSpec(f"s{i}", source=f"synth:{300 + 200 * i},900",
                   pipe={"fg": (1, 0, 0, 1), "bg": (0, 0, 0, 0)})
        for i in range(8)
    ]
    f = FleetEngine(_loaded(), streams, mesh=mesh)
    f.run(max_seconds=2.5)
    fr = f.tex(0)
    assert fr is not None and fr.shape == (64, 96, 4)
    assert f.frames_rendered > 3


def test_fleet_dynamics_gravity_and_interp():
    """FleetDynamics pins the single-stream engine semantics per
    stream: measured-UPS gravity feedback (render.c:728), kcounter
    interpolation ramps (render.c:1792-1809), and the nominal/8 stall
    guard — under a throttled frame clock."""
    from glava_tpu.runtime.fleet import FleetDynamics

    nominal = 86.1328125
    dyn = FleetDynamics(2, nominal_ups=nominal, framerate=60)
    # stream0 updates every frame at 60 fps; stream1 every 4th frame
    for i in range(60):
        dyn.frame(np.array([True, i % 4 == 0]), fps=60.0)
    ups = dyn.tick(1.0)
    np.testing.assert_allclose(ups, [60.0, 15.0])
    # gravity decay rate follows each stream's measured UPS
    np.testing.assert_allclose(
        dyn.gravity(4.2), [4.2 / 60.0, 4.2 / 15.0], rtol=1e-6
    )
    # interpolation: slow stream ramps uratio*kcounter toward 1
    interps = [dyn.frame(np.array([True, i == 0]), fps=60.0)
               for i in range(4)]
    np.testing.assert_allclose(
        [float(x[1]) for x in interps], [0.25, 0.25, 0.5, 0.75], atol=1e-6
    )
    assert all(float(x[0]) == 1.0 for x in interps)  # fast stream: 1.0
    # stall guard: a silent second decays at nominal/8, not div-by-~0
    dyn.tick(1.0)
    np.testing.assert_allclose(
        dyn.gravity(4.2), [4.2 / (nominal / 8)] * 2, rtol=1e-6
    )
