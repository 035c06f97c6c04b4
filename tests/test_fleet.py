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
    # frame-count bound: first-compile time varies when the full suite
    # shares the process (a pure time bound flakes)
    f.run(max_frames=10, max_seconds=30.0)
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


def _loaded_mod(mod, extra=(), geom="0 0 96 64"):
    return loader.load(
        cli_requests=(f"setgeometry {geom}", "setprintframes false",
                      "setbufsize 1024", "setsamplesize 256") + tuple(extra),
        force_module=mod,
    )


def test_mixed_modules_match_single_module_renderers():
    """One program serving bars+radial+wave streams produces exactly
    the frames three single-module batched renderers produce."""
    import jax
    import jax.numpy as jnp

    from glava_tpu.parallel.batch import BatchedRenderer, MixedBatchedRenderer

    mods = ["bars", "radial", "wave"]
    loadeds = [_loaded_mod(m) for m in mods]
    assign = [0, 1, 2, 1, 0]          # interleaved on purpose
    S = len(assign)
    mx = MixedBatchedRenderer(loadeds, assign)
    singles = [BatchedRenderer(loadeds[assign[s]], n_streams=1)
               for s in range(S)]

    rng = np.random.default_rng(7)
    sm = mx.init_state()
    ss = [b.init_state() for b in singles]
    g = np.float32(0.05)
    step_m = jax.jit(mx.step)
    steps_s = [jax.jit(b.step) for b in singles]
    for it in range(8):
        audio = jnp.asarray(
            rng.standard_normal((S, 2, 1024)).astype(np.float32) * 0.3
        )
        mods_mask = jnp.asarray([(it % (s + 1)) == 0 for s in range(S)])
        sm, fm = step_m(
            sm, audio, mods_mask, jnp.zeros((S,), jnp.float32),
            jnp.ones((S,), jnp.float32), jnp.full((S,), g), {},
        )
        for s in range(S):
            k = assign[s]
            ss[s], fs = steps_s[s](
                ss[s], audio[s:s + 1], mods_mask[s:s + 1],
                jnp.zeros((1,), jnp.float32), jnp.ones((1,), jnp.float32),
                jnp.full((1,), g), {},
            )
            np.testing.assert_allclose(
                np.asarray(fm[s]), np.asarray(fs[0]), atol=5e-5,
                err_msg=f"stream {s} (module {mods[k]}) diverged at it {it}",
            )
    assert (np.asarray(fm)[..., 3] > 0).any()


def test_fleet_engine_heterogeneous_modules():
    """One FleetEngine, three different modules, single jitted step."""
    # 288x288: big enough for radial's default C_RADIUS (128)
    shared = _loaded_mod("bars", geom="0 0 288 288")
    radial = _loaded_mod("radial", geom="0 0 288 288")
    wave = _loaded_mod("wave", geom="0 0 288 288")
    streams = [
        StreamSpec("a", source="synth:400,800"),
        StreamSpec("b", source="synth:400,800", loaded=radial),
        StreamSpec("c", source="synth:400,800", loaded=wave),
    ]
    f = FleetEngine(shared, streams)
    from glava_tpu.parallel.batch import MixedBatchedRenderer

    assert isinstance(f.br, MixedBatchedRenderer)
    f.run(max_frames=20, max_seconds=60.0)
    frames = [f.tex(i) for i in range(3)]
    assert all(fr is not None for fr in frames)
    assert all((fr[..., 3] > 0).any() for fr in frames)
    assert not np.array_equal(frames[0], frames[1])
    assert not np.array_equal(frames[1], frames[2])


def test_mixed_modules_incompatible_dsp_rejected():
    import pytest

    from glava_tpu.parallel.batch import MixedBatchedRenderer

    a = _loaded_mod("bars")
    b = _loaded_mod("wave", extra=("setbufsize 2048",))
    with pytest.raises(ValueError, match="bufsize"):
        MixedBatchedRenderer([a, b], [0, 1])


def test_mixed_fleet_on_device_mesh():
    """Heterogeneous modules + mesh sharding compose: a mixed fleet
    shards streams over the mesh data axis in one program."""
    import jax

    from glava_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], rows=1)
    shared = _loaded_mod("bars", geom="0 0 288 288")
    wave = _loaded_mod("wave", geom="0 0 288 288")
    streams = [
        StreamSpec(f"s{i}", source="synth:400,800",
                   loaded=(wave if i % 2 else None))
        for i in range(8)
    ]
    f = FleetEngine(shared, streams, mesh=mesh)
    from glava_tpu.parallel.batch import MixedBatchedRenderer

    assert isinstance(f.br, MixedBatchedRenderer)
    f.run(max_frames=10, max_seconds=60.0)
    a, b = f.tex(0), f.tex(1)
    assert a is not None and b is not None
    assert (a[..., 3] > 0).any() and (b[..., 3] > 0).any()
    assert not np.array_equal(a, b)  # different modules


def test_fleet_serve_example(tmp_path):
    """The packaged fleet-serving example stays runnable."""
    import runpy
    import sys

    out = tmp_path / "sheet.png"
    argv = sys.argv
    sys.argv = ["fleet_serve.py", str(out)]
    try:
        runpy.run_path("docs/examples/fleet_serve.py", run_name="__main__")
    finally:
        sys.argv = argv
    from glava_tpu.runtime.sinks import read_png

    img = read_png(out)
    assert img.shape == (288, 288 * 3, 4)


def test_row_sharded_raster_no_full_frame_allgather():
    """The spatially-sharded raster must hold its row sharding end to
    end: per-device output shards are (S/streams, H/rows, W, 4) and the
    compiled HLO contains no full-frame all-gather (the small spectrum
    textures are replicated on purpose; the frame must not be)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    import __graft_entry__ as ge
    from glava_tpu.config import loader
    from glava_tpu.parallel.batch import BatchedRenderer, example_batch
    from glava_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(jax.devices()[:8], rows=2)
    lc = loader.load(
        cli_requests=("setgeometry 0 0 256 128", "setbufsize 1024",
                      "setsamplesize 256", "setprintframes false"),
        force_module="bars",
    )
    br = BatchedRenderer(lc, n_streams=8)
    step = br.sharded_step(mesh)
    state = br.shard_state(br.init_state(), mesh)
    ex = example_batch(br)
    s = NamedSharding(mesh, P("streams"))
    args = {k: jax.device_put(v, s) for k, v in ex.items()}

    ge._assert_no_frame_allgather(step, state, args, (8, 128, 256, 4))

    state, frame = step(
        state, args["audio"], args["modified"], args["time"],
        args["interp_mod"], args["gravity_g"], {},
    )
    shard_shapes = {sh.data.shape for sh in frame.addressable_shards}
    assert shard_shapes == {(2, 64, 256, 4)}, shard_shapes


def test_hosts_mesh_stream_dp_zero_collectives():
    """Multi-host recipe: on a ('hosts','streams','rows') mesh the
    stream-DP step compiles to ZERO collectives (per-step DCN traffic
    is none) and matches the unsharded step exactly."""
    import re

    import jax
    from glava_tpu.config import loader
    from glava_tpu.parallel.batch import BatchedRenderer, example_batch
    from glava_tpu.parallel.mesh import make_mesh, stream_sharding

    mesh = make_mesh(jax.devices()[:8], hosts=2, rows=1)
    assert mesh.axis_names == ("hosts", "streams", "rows")
    lc = loader.load(
        cli_requests=("setgeometry 0 0 64 64", "setbufsize 256",
                      "setsamplesize 64", "setprintframes false"),
        force_module="bars",
    )
    br = BatchedRenderer(lc, n_streams=8)
    step = br.sharded_step(mesh)
    state = br.shard_state(br.init_state(), mesh)
    ex = example_batch(br)
    s = stream_sharding(mesh)
    args = {k: jax.device_put(v, s) for k, v in ex.items()}
    txt = step.lower(
        state, args["audio"], args["modified"], args["time"],
        args["interp_mod"], args["gravity_g"], {},
    ).compile().as_text()
    assert re.search(
        r"all-gather|all-reduce|collective-permute|reduce-scatter"
        r"|all-to-all", txt, re.IGNORECASE) is None

    state, frame = step(
        state, args["audio"], args["modified"], args["time"],
        args["interp_mod"], args["gravity_g"], {},
    )
    _, ref = jax.jit(br.step)(
        br.init_state(), ex["audio"], ex["modified"], ex["time"],
        ex["interp_mod"], ex["gravity_g"], {},
    )
    import jax.numpy as jnp

    assert float(jnp.max(jnp.abs(frame - ref))) <= 1e-5
