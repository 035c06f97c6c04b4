"""Runtime tests: engine loop, sinks, pipe protocol, batching, mesh."""

import io

import numpy as np
import pytest
import jax

from glava_tpu.config import loader
from glava_tpu.parallel.batch import BatchedRenderer, example_batch
from glava_tpu.parallel.mesh import make_mesh
from glava_tpu.runtime import sinks
from glava_tpu.runtime.engine import Engine, EngineOptions
from glava_tpu.runtime.stdin_pipe import PipeBind, PipeReader, parse_line, parse_value


# ---------------------------------------------------------------------------
# stdin pipe protocol (render.c:1861-2005 semantics)
# ---------------------------------------------------------------------------

def test_parse_values():
    assert parse_value("bool", "true") == 1.0
    assert parse_value("bool", "False") == 0.0
    with pytest.raises(ValueError):
        parse_value("bool", "yes")
    assert parse_value("int", "42") == 42.0
    assert parse_value("float", "1.5") == 1.5
    assert parse_value("vec2", "1.0,2.0") == (1.0, 2.0)
    assert parse_value("vec4", "1,2,3,4") == (1.0, 2.0, 3.0, 4.0)
    c = parse_value("vec4", "#ff000080")
    assert c[0] == 1.0 and abs(c[3] - 0x80 / 255) < 1e-9


def test_parse_line_and_default_bind():
    binds = {"fg": PipeBind("fg", "vec4"), "_": PipeBind("_", "float")}
    assert parse_line("fg = #ff0000", binds) == ("fg", (1.0, 0.0, 0.0, 1.0))
    assert parse_line("0.75", binds) == ("_", 0.75)  # bare value -> PIPE_DEFAULT
    with pytest.raises(KeyError):
        parse_line("nope = 1", binds)


def test_pipe_reader_thread():
    stream = io.StringIO("amp = 0.5\namp = 0.9\n")
    r = PipeReader([PipeBind("amp", "float")], stream)
    r.start()
    import time

    for _ in range(100):
        if r.eof:
            break
        time.sleep(0.01)
    assert r.snapshot()["amp"] == 0.9


# ---------------------------------------------------------------------------
# sinks
# ---------------------------------------------------------------------------

def test_y4m_sink_c444():
    buf = io.BytesIO()
    s = sinks.Y4MSink(buf, fps=60, subsampling="444")
    frame = np.zeros((4, 6, 4), np.uint8)
    frame[..., 0] = 255  # red
    s.submit(frame, 0.0)
    data = buf.getvalue()
    assert data.startswith(b"YUV4MPEG2 W6 H4 F60:1")
    assert b"C444" in data.split(b"\n", 1)[0]
    assert len(data.split(b"FRAME\n", 1)[1]) == 3 * 4 * 6


def test_y4m_sink_c420_default():
    """Default y4m is C420jpeg: 1.5 B/px payload, host-converted when
    fed an RGBA8 ndarray, device planes passed straight through."""
    buf = io.BytesIO()
    s = sinks.Y4MSink(buf, fps=60)
    assert s.wire_format == "yuv420"
    frame = np.zeros((4, 6, 4), np.uint8)
    frame[..., 0] = 255
    s.submit(frame, 0.0)
    data = buf.getvalue()
    assert b"C420jpeg" in data.split(b"\n", 1)[0]
    payload = data.split(b"FRAME\n", 1)[1]
    assert len(payload) == 4 * 6 + 2 * (2 * 3)
    # red: Y ~ 76, U ~ 85, V = 255 (BT.601 full range)
    y = np.frombuffer(payload[:24], np.uint8)
    u = np.frombuffer(payload[24:30], np.uint8)
    v = np.frombuffer(payload[30:], np.uint8)
    assert abs(int(y[0]) - 76) <= 1
    assert abs(int(u[0]) - 85) <= 1
    assert int(v[0]) == 255

    # device-packed plane tuple round-trips byte-identical
    buf2 = io.BytesIO()
    s2 = sinks.Y4MSink(buf2, fps=60)
    planes = (np.full((4, 6), 76, np.uint8),
              np.full((2, 3), 90, np.uint8),
              np.full((2, 3), 255, np.uint8))
    s2.submit(planes, 0.0)
    p2 = buf2.getvalue().split(b"FRAME\n", 1)[1]
    assert p2 == b"\x4c" * 24 + b"\x5a" * 6 + b"\xff" * 6


def test_yuv420_pack_device_matches_host():
    """renderer.yuv420_pack (the jitted device path) vs the numpy
    mirror: <= 1 LSB everywhere (fma ordering)."""
    import jax

    from glava_tpu.renderer import yuv420_pack, yuv420_pack_host

    rng = np.random.default_rng(5)
    frame = rng.random((8, 12, 4)).astype(np.float32)
    dev = jax.jit(yuv420_pack)(frame)
    u8 = np.clip(np.rint(frame * 255.0), 0, 255).astype(np.uint8)
    host = yuv420_pack_host(u8)
    for d, hh in zip(dev, host):
        d = np.asarray(d)
        assert d.shape == hh.shape
        assert np.abs(d.astype(int) - hh.astype(int)).max() <= 1


def test_png_sink(tmp_path):
    p = tmp_path / "f.png"
    s = sinks.PngSink(p)
    s.submit(np.full((2, 2, 4), 128, np.uint8), 0.0)
    assert p.read_bytes().startswith(b"\x89PNG")


def test_shm_sink_roundtrip(tmp_path):
    path = str(tmp_path / "frames.shm")
    s = sinks.ShmSink(path)
    frame = np.arange(4 * 6 * 4, dtype=np.uint8).reshape(4, 6, 4)
    s.submit(frame, 0.0)
    out = sinks.read_shm_frame(path)
    np.testing.assert_array_equal(out, frame)
    frame2 = frame[::-1].copy()
    s.submit(frame2, 0.1)
    np.testing.assert_array_equal(sinks.read_shm_frame(path), frame2)
    s.close()


def test_stdin_legacy_mode():
    from glava_tpu.runtime.stdin_pipe import PipeBind, parse_line

    binds = {"STDIN": PipeBind("STDIN", "vec4")}
    name, val = parse_line("#ff0000", binds)
    assert name == "STDIN" and val[0] == 1.0


def test_make_sink_specs():
    assert isinstance(sinks.make_sink("null"), sinks.NullSink)
    assert isinstance(sinks.make_sink("latest"), sinks.LatestFrameSink)
    with pytest.raises(ValueError):
        sinks.make_sink("bogus")


# ---------------------------------------------------------------------------
# engine
# ---------------------------------------------------------------------------

def test_engine_golden_mode():
    eng = Engine(EngineOptions(audio_backend="synth", test_mode=True,
                               screen=(32, 32)))
    assert eng.run_tests() is True


def test_engine_renders_and_control_api():
    frames = []
    eng = Engine(
        EngineOptions(audio_backend="synth", screen=(96, 64),
                      requests=("setprintframes false",)),
        sink=sinks.CallbackSink(lambda f, t: frames.append(f)),
    )
    eng.run(max_seconds=2.5)
    assert len(frames) > 5
    assert frames[-1].shape == (64, 96, 4)
    assert (frames[-1][..., 3] > 0).any(), "no content rendered"


def test_engine_pipe_uniform_changes_color():
    """--pipe fg live-overrides the bars COLOR expression."""
    stream = io.StringIO("fg = #00ff00\n")
    frames = []
    eng = Engine(
        EngineOptions(
            audio_backend="synth", screen=(96, 64),
            requests=("setprintframes false",),
            pipe_binds=(PipeBind("fg", "vec4"), PipeBind("bg", "vec4")),
        ),
        sink=sinks.CallbackSink(lambda f, t: frames.append(f)),
        pipe_stream=stream,
    )
    eng.run(max_seconds=2.5)
    last = frames[-1]
    drawn = last[last[..., 3] > 0]
    assert drawn.size > 0
    # all drawn pixels pure green (both COLOR and BAR_OUTLINE derive from @fg/@bg)
    assert drawn[:, 1].min() == 255
    assert drawn[:, 0].max() == 0


# ---------------------------------------------------------------------------
# batched multi-stream + mesh
# ---------------------------------------------------------------------------

def _tiny_loaded():
    return loader.load(
        cli_requests=("setgeometry 0 0 48 32", "setbufsize 256",
                      "setsamplesize 64", "setprintframes false"),
        force_module="bars",
    )


def test_batched_renderer_shapes():
    br = BatchedRenderer(_tiny_loaded(), n_streams=4)
    ex = example_batch(br)
    state = br.init_state()
    step = jax.jit(br.step)
    for _ in range(8):  # fill the averaging window
        state, frames = step(
            state, ex["audio"], ex["modified"], ex["time"], ex["interp_mod"],
            ex["gravity_g"], {},
        )
    assert frames.shape == (4, 32, 48, 4)
    f = np.asarray(frames)
    assert np.isfinite(f).all()
    assert (f[..., 3] > 0).any()
    # streams see different tones -> different frames
    assert not np.array_equal(f[0], f[1])


def test_sharded_step_8_devices():
    assert len(jax.devices()) >= 8, "conftest should provide 8 CPU devices"
    mesh = make_mesh(jax.devices()[:8], rows=2)
    br = BatchedRenderer(_tiny_loaded(), n_streams=8)
    step = br.sharded_step(mesh)
    state = br.shard_state(br.init_state(), mesh)
    ex = example_batch(br)
    state, frames = step(state, ex["audio"], ex["modified"], ex["time"],
                         ex["interp_mod"], ex["gravity_g"], {})
    assert frames.shape == (8, 32, 48, 4)
    assert "streams" in str(frames.sharding.spec)


def test_graft_entry_and_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    state, frame = jax.jit(fn)(*args)
    assert frame.shape == (256, 512, 4)
    g.dryrun_multichip(8)


def test_engine_reload_rebuilds():
    """SIGUSR1 semantics: teardown + re-instantiate (glava.c:575-576)."""
    frames = []
    eng = Engine(
        EngineOptions(audio_backend="synth", screen=(48, 32),
                      requests=("setprintframes false", "setbufsize 1024",
                                "setsamplesize 256")),
        sink=sinks.CallbackSink(lambda f, t: frames.append(f)),
    )
    first_loaded = eng.loaded

    def trigger(f, t):
        frames.append(f)
        if len(frames) == 5:
            eng.reload()
        if len(frames) >= 12:
            eng.terminate()

    eng.sink = sinks.CallbackSink(trigger)
    eng.run(max_seconds=20.0)
    assert len(frames) >= 12
    assert eng.loaded is not first_loaded  # rebuilt after reload


def test_engine_reload_with_cached_static_lookup(tmp_path, monkeypatch):
    """Reload re-jits a NEW program; static-lookup closures cached in
    _STATIC_LK_CACHE (keyed by index-plane sha1) are shared across the
    programs and must not capture trace-level values — pre-fix this
    raised UnexpectedTracerError on the first post-reload frame
    (ops/pallas/lookup.py builders now keep numpy captures)."""
    from glava_tpu.config.glsl_shader import _STATIC_LK_CACHE

    mod = tmp_path / "lkmod"
    mod.mkdir()
    # a per-pixel 2-D concrete index plane (depends on BOTH axes, so
    # no axis-constant fast path) >= 2^16 points -> the static
    # sorted-block lookup route inside the jit trace
    (mod / "1.frag").write_text(
        "in vec4 gl_FragCoord;\n"
        "#request uniform \"screen\" screen\n"
        "uniform ivec2 screen;\n"
        "#request uniform \"audio_l\" audio_l\n"
        "#request transform audio_l \"window\"\n"
        "#request transform audio_l \"fft\"\n"
        "uniform sampler1D audio_l;\n"
        "#request uniform \"audio_sz\" audio_sz\n"
        "uniform int audio_sz;\n"
        "out vec4 fragment;\n"
        "void main() {\n"
        "    float p = fract((gl_FragCoord.x * 0.7 + gl_FragCoord.y * 0.3)"
        " / screen.x);\n"
        "    float v = smooth_audio(audio_l, audio_sz, p);\n"
        "    fragment = vec4(clamp(v * 40.0, 0.0, 1.0), 0.2, 0.3, 1.0);\n"
        "}\n")
    (tmp_path / "rc.glsl").write_text(
        "#request mod lkmod\n#request setgeometry 0 0 320 240\n"
        "#request setbufsize 1024\n#request setsamplesize 256\n"
        "#request setprintframes false\n")
    monkeypatch.setenv("GLAVA_TPU_STATIC_LK", "interpret")
    _STATIC_LK_CACHE.clear()
    frames = []
    eng = Engine(
        EngineOptions(audio_backend="synth", user_dir=str(tmp_path)),
        sink=sinks.CallbackSink(lambda f, t: frames.append(f)),
    )

    def trigger(f, t):
        frames.append(f)
        if len(frames) == 3:
            eng.reload()
        if len(frames) >= 6:
            eng.terminate()

    eng.sink = sinks.CallbackSink(trigger)
    eng.run(max_seconds=60.0)
    assert len(frames) >= 6
    assert _STATIC_LK_CACHE, "static lookup path did not engage"
    import numpy as np

    assert np.isfinite(np.asarray(frames[-1], dtype=np.float32)).all()


def test_engine_fifo_missing_path_fails_fast(tmp_path):
    """Capture errors surface instead of silent stale rendering
    (reference exits on source errors, fifo.c:45-48)."""
    eng = Engine(EngineOptions(
        audio_backend="fifo", screen=(32, 32),
        requests=("setprintframes false", "setbufsize 1024",
                  "setsamplesize 256",
                  f'setsource "{tmp_path}/does_not_exist"'),
    ))
    with pytest.raises(RuntimeError, match="audio backend failed|FIFO"):
        eng.run(max_seconds=5.0)


def test_profiling_utils(tmp_path):
    from glava_tpu.utils import profiling

    with profiling.trace(str(tmp_path / "trace")):
        import jax.numpy as jnp

        _ = (jnp.ones(8) * 2).block_until_ready()
    assert any((tmp_path / "trace").rglob("*")), "no trace files written"

    rc = profiling.RateCounter(window=0.0)
    assert rc.tick() is True and rc.rate > 0
    lt = profiling.LatencyTracker(capacity=4)
    for v in (5, 1, 3, 2, 4):
        lt.record(v)
    assert lt.percentile(50) in (2, 3)


def test_cli_parser_surface():
    """The reference flag surface parses (glava.c:216-234 parity)."""
    from glava_tpu.cli import build_parser

    p = build_parser()
    a = p.parse_args([
        "-v", "-d", "-r", "setframerate 30", "-r", "setmirror true",
        "-m", "graph", "-e", "custom.glsl", "-a", "synth",
        "-p", "fg", "-p", "amp:float", "--stdin", "vec4",
        "--sink", "null", "--frames", "10", "--size", "640x360",
    ])
    assert a.verbose and a.desktop
    assert a.request == ["setframerate 30", "setmirror true"]
    assert a.force_mod == "graph" and a.entry == "custom.glsl"
    assert [b.stype for b in a.pipe] == ["vec4", "float"]
    assert a.stdin == "vec4"
    assert a.frames == 10 and a.size == "640x360"


def test_engine_memory_stability():
    """No unbounded growth across a few hundred frames."""
    import gc
    import resource

    eng = Engine(EngineOptions(audio_backend="synth", screen=(48, 32),
                               requests=("setprintframes false",
                                         "setbufsize 1024",
                                         "setsamplesize 256")),
                 sink=sinks.NullSink())
    eng.run(max_frames=50)  # warm caches
    gc.collect()
    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    eng2 = Engine(EngineOptions(audio_backend="synth", screen=(48, 32),
                                requests=("setprintframes false",
                                          "setbufsize 1024",
                                          "setsamplesize 256")),
                  sink=sinks.NullSink())
    eng2.run(max_frames=400)
    gc.collect()
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is a high-water mark; allow modest growth only
    assert rss1 - rss0 < 200_000, f"RSS grew {rss1 - rss0} KiB"


def test_engine_frame_limiter():
    """`setframerate 30` paces the loop (render.c:2361-2372)."""
    import time

    frames = []
    eng = Engine(EngineOptions(audio_backend="synth", screen=(48, 32),
                               requests=("setprintframes false",
                                         "setframerate 30",
                                         "setbufsize 1024",
                                         "setsamplesize 256")),
                 sink=sinks.CallbackSink(lambda f, t: frames.append(time.monotonic())))
    eng.run(max_seconds=2.0)
    assert len(frames) >= 10
    span = frames[-1] - frames[0]
    rate = (len(frames) - 1) / span
    assert 20 <= rate <= 40, f"limiter produced {rate:.1f} fps"


# -- native PulseAudio (ctypes pa_simple) against a fake libpulse ----------

class _FakeLibpulse:
    """Emulates the 4 libpulse-simple entry points the binding uses;
    produces deterministic interleaved fragments and terminates the
    capture after 3 reads."""

    def __init__(self, audio):
        self.audio = audio
        self.new_args = None
        self.reads = 0
        self.freed = False

    def pa_simple_new(self, server, app, direction, source, desc,
                      ss_ref, chmap, pb_ref, err_ref):
        self.new_args = dict(
            app=app, direction=direction, source=source,
            ss=type(ss_ref._obj)(ss_ref._obj.format, ss_ref._obj.rate,
                                 ss_ref._obj.channels),
            fragsize=pb_ref._obj.fragsize, maxlength=pb_ref._obj.maxlength,
        )
        return 1  # truthy handle

    def pa_simple_read(self, handle, buf, nbytes, err_ref):
        import ctypes
        n = int(getattr(nbytes, "value", nbytes))
        floats = n // 4
        frames = floats // 2
        base = self.reads * frames
        inter = np.empty((floats,), np.float32)
        inter[0::2] = 0.001 * (base + np.arange(frames))   # left
        inter[1::2] = -0.001 * (base + np.arange(frames))  # right
        ctypes.memmove(buf, inter.tobytes(), n)
        self.reads += 1
        if self.reads >= 3:
            self.audio.terminate = True
        return 0

    def pa_simple_free(self, handle):
        self.freed = True

    def pa_strerror(self, code):
        return b"fake error"


def test_pulse_native_fake_libpulse():
    """The ctypes pa_simple path configures the stream exactly like
    pulse_input.c:114-123 (float32ne stereo, fragsize = sample_sz,
    maxlength -1) and de-interleaves fragments into the ring."""
    from glava_tpu.runtime.audio import AudioData
    from glava_tpu.runtime.audio import pa_simple as pas
    from glava_tpu.runtime.audio.pulse import PulseBackend

    audio = AudioData(
        buffer=np.zeros((2, 64), np.float32), sample_sz=32, rate=22050,
        channels=2, source="fake.monitor",
    )
    fake = _FakeLibpulse(audio)
    b = PulseBackend()
    b.libpulse = fake
    b._entry_native(audio)

    assert fake.new_args["direction"] == pas.PA_STREAM_RECORD
    assert fake.new_args["source"] == b"fake.monitor"
    assert fake.new_args["fragsize"] == 32            # = sample_sz bytes
    assert fake.new_args["maxlength"] == 0xFFFFFFFF   # (uint32_t) -1
    ss = fake.new_args["ss"]
    assert ss.format == pas.FSAMPLE_FORMAT
    assert ss.rate == 22050 and ss.channels == 2
    assert fake.reads == 3 and fake.freed

    snap, mod = audio.snapshot()
    assert mod
    hop = audio.hop  # 8 frames/fragment, 3 fragments pushed
    want_l = 0.001 * np.arange(3 * hop, dtype=np.float32)
    np.testing.assert_allclose(snap[0, -3 * hop:], want_l, atol=1e-7)
    np.testing.assert_allclose(snap[1, -3 * hop:], -want_l, atol=1e-7)
    assert (snap[:, : -3 * hop] == 0).all()


def test_pulse_native_mono_mixdown():
    """channels == 1 mixes both channels into each ring
    (pulse_input.c:163-168 / setmirror)."""
    from glava_tpu.runtime.audio import AudioData
    from glava_tpu.runtime.audio.pulse import PulseBackend

    audio = AudioData(
        buffer=np.zeros((2, 64), np.float32), sample_sz=32, rate=22050,
        channels=1, source="fake.monitor",
    )
    fake = _FakeLibpulse(audio)
    b = PulseBackend()
    b.libpulse = fake
    b._entry_native(audio)
    snap, _ = audio.snapshot()
    # left = x, right = -x -> mono mixdown = 0 everywhere
    np.testing.assert_allclose(snap, 0.0, atol=1e-7)
    assert fake.reads == 3


def test_pulse_missing_everything_fails_clearly(monkeypatch):
    import shutil as _shutil

    from glava_tpu.runtime.audio import AudioData
    from glava_tpu.runtime.audio import pa_simple as pas
    from glava_tpu.runtime.audio.pulse import PulseBackend

    monkeypatch.setattr(_shutil, "which", lambda *_: None)
    monkeypatch.setattr(pas, "load_libpulse", lambda: None)
    b = PulseBackend()
    audio = AudioData(
        buffer=np.zeros((2, 64), np.float32), sample_sz=32, rate=22050,
        channels=2, source="x.monitor",
    )
    with pytest.raises(RuntimeError, match="libpulse-simple or `parec`"):
        b.init(audio)


# -- live display sink (window) against a fake player ----------------------

_FAKE_PLAYER = (
    "import sys\n"
    "hdr = sys.stdin.buffer.readline()\n"
    "assert hdr.startswith(b'YUV4MPEG2')\n"
    "n = 0\n"
    "w = h = 0\n"
    "csz = 0\n"
    "for tok in hdr.split():\n"
    "    if tok[:1] == b'W': w = int(tok[1:])\n"
    "    if tok[:1] == b'H': h = int(tok[1:])\n"
    "    if tok[:1] == b'C':\n"
    "        csz = (w * h * 3 // 2) if b'420' in tok else 3 * w * h\n"
    "if not csz: csz = 3 * w * h\n"
    "while n < 3:\n"
    "    line = sys.stdin.buffer.readline()\n"
    "    if not line: break\n"
    "    assert line == b'FRAME\\n'\n"
    "    data = sys.stdin.buffer.read(csz)\n"
    "    if len(data) < csz: break\n"
    "    n += 1\n"
    "open(sys.argv[1], 'w').write(f'{w}x{h}:{n}')\n"
)


def test_window_sink_fake_player(tmp_path):
    """WindowSink pipes a valid y4m stream into the player process and
    reports should_close when the window (process) goes away."""
    import sys
    import time as _t

    from glava_tpu.runtime.sinks import WindowSink

    out = tmp_path / "seen.txt"
    script = tmp_path / "player.py"
    script.write_text(_FAKE_PLAYER)
    sink = WindowSink(f"{sys.executable} {script} {out}", fps=30)
    frame = np.zeros((16, 24, 4), np.uint8)
    frame[..., 0] = 200
    assert not sink.should_close()
    # the fake player exits after 3 frames = window closed
    for _ in range(16):
        sink.submit(frame, 0.0)
        if sink.should_close():
            break
        _t.sleep(0.02)
    deadline = _t.monotonic() + 5.0
    while not sink.should_close() and _t.monotonic() < deadline:
        sink.submit(frame, 0.0)
        _t.sleep(0.02)
    assert sink.should_close()
    sink.close()
    assert out.read_text() == "24x16:3"


def test_window_sink_missing_player_fails_clearly(monkeypatch):
    import shutil as _shutil

    from glava_tpu.runtime.sinks import WindowSink

    monkeypatch.setattr(_shutil, "which", lambda *_: None)
    monkeypatch.delenv("GLAVA_TPU_PLAYER", raising=False)
    with pytest.raises(RuntimeError, match="no video player"):
        WindowSink("")


def test_engine_exits_on_window_close(tmp_path):
    """Window-close semantics: the engine frame loop exits when the
    sink's presentation target is gone (glx_wcb.c:319-333)."""
    import sys

    from glava_tpu.runtime.engine import Engine, EngineOptions
    from glava_tpu.runtime.sinks import WindowSink

    out = tmp_path / "seen.txt"
    script = tmp_path / "player.py"
    script.write_text(_FAKE_PLAYER)
    opts = EngineOptions(
        requests=("setgeometry 0 0 32 16", "setbufsize 1024",
                  "setsamplesize 256", "setprintframes false",
                  "setframerate 0"),
        force_module="bars", audio_backend="synth",
    )
    sink = WindowSink(f"{sys.executable} {script} {out}", fps=30)
    eng = Engine(opts, sink=sink)
    eng.run(max_seconds=20.0)   # exits via window close, not the timeout
    assert sink.should_close()
    assert out.read_text().startswith("32x16:")


def test_read_png_roundtrip(tmp_path):
    rng = np.random.default_rng(11)
    frame = rng.integers(0, 256, (17, 23, 4), dtype=np.uint8)
    p = tmp_path / "rt.png"
    sinks.write_png(p, frame)          # writer takes bottom-up frames
    back = sinks.read_png(p)           # reader returns top-down
    np.testing.assert_array_equal(back, frame[::-1])


def test_read_png_filtered(tmp_path):
    """Exercise Sub/Up/Average/Paeth unfiltering (wallpapers from real
    encoders use them; our writer only emits filter 0)."""
    import struct as _struct
    import zlib as _zlib

    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (6, 8, 3), dtype=np.uint8)
    # encode manually with a different filter per row
    stride = 8 * 3
    rows = []
    prev = np.zeros((stride,), np.int32)
    for y in range(6):
        cur = img[y].reshape(-1).astype(np.int32)
        f = y % 5
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            enc = (cur - left) % 256
        elif f == 2:
            enc = (cur - prev) % 256
        elif f == 3:
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            enc = (cur - ((left + prev) >> 1)) % 256
        else:
            left = np.concatenate([np.zeros(3, np.int32), cur[:-3]])
            ul = np.concatenate([np.zeros(3, np.int32), prev[:-3]])
            p = left + prev - ul
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - ul)
            pred = np.where((pa <= pb) & (pa <= pc), left,
                            np.where(pb <= pc, prev, ul))
            enc = (cur - pred) % 256
        rows.append(bytes([f]) + enc.astype(np.uint8).tobytes())
        prev = cur
    raw = b"".join(rows)

    def chunk(t, d):
        c = t + d
        return _struct.pack(">I", len(d)) + c + _struct.pack(
            ">I", _zlib.crc32(c))

    data = (b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", _struct.pack(">IIBBBBB", 8, 6, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", _zlib.compress(raw)) + chunk(b"IEND", b""))
    p = tmp_path / "filt.png"
    p.write_bytes(data)
    back = sinks.read_png(p)
    np.testing.assert_array_equal(back[..., :3], img)
    assert (back[..., 3] == 255).all()


def test_xroot_composites_over_bg_image(tmp_path):
    """setopacity xroot + setbgimg: undrawn pixels show the wallpaper
    sampled at the window geometry (the xwin_copyglbg capability)."""
    from glava_tpu.renderer import Renderer
    import jax.numpy as jnp

    # 64x48 wallpaper with a recognizable gradient
    wall = np.zeros((48, 64, 4), np.uint8)
    wall[..., 0] = np.arange(64, dtype=np.uint8)[None, :] * 3
    wall[..., 1] = np.arange(48, dtype=np.uint8)[:, None] * 5
    wall[..., 3] = 255
    wp = tmp_path / "wall.png"
    sinks.write_png(wp, wall[::-1])  # writer flips; store top-down `wall`

    lc = loader.load(
        cli_requests=("setgeometry 8 6 32 16", "setbufsize 1024",
                      "setsamplesize 256", "setprintframes false",
                      'setopacity "xroot"', f'setbgimg "{wp}"'),
        force_module="bars",
    )
    r = Renderer(lc)
    state = r.init_state()
    step = r.jit_step()
    snap = jnp.zeros((2, lc.cfg.bufsize), jnp.float32)  # silence: no bars
    _, frame = step(state, snap, True, np.float32(0.0), np.float32(1.0),
                    np.float32(0.05), {})
    got = np.asarray(frame)[::-1]  # top-down
    want = wall[6:6 + 16, 8:8 + 32].astype(np.float32) / 255.0
    want[..., 3] = 1.0
    np.testing.assert_allclose(got, want, atol=2e-3)


def test_engine_reacts_to_background_change(tmp_path):
    """The reference re-copies the root pixmap when the wallpaper
    changes at runtime (glx_wcb.c:341-356 -> render.c:1832-1837); here
    the engine polls the setbgimg file and swaps the composite planes
    mid-run with no recompile. Swap a solid-red wallpaper for a solid-
    blue one after a few frames and assert the background follows."""
    def solid(r, g, b):
        w = np.zeros((48, 64, 4), np.uint8)
        w[..., 0], w[..., 1], w[..., 2], w[..., 3] = r, g, b, 255
        return w

    wp = tmp_path / "wall.png"
    sinks.write_png(wp, solid(255, 0, 0))

    frames = []

    def on_frame(f, t):
        frames.append(f)
        if len(frames) == 5:
            sinks.write_png(wp, solid(0, 0, 255))

    eng = Engine(
        EngineOptions(
            audio_backend="synth", screen=(64, 48),
            requests=("setprintframes false", 'setopacity "xroot"',
                      f'setbgimg "{wp}"'),
        ),
        sink=sinks.CallbackSink(on_frame),
    )
    eng.run(max_frames=30)
    assert len(frames) >= 30

    def bg_color(frame):
        # bars leave gap columns undrawn at every amplitude — the
        # modal pixel color IS the background
        px = frame[..., :3].reshape(-1, 3)
        colors, counts = np.unique(px, axis=0, return_counts=True)
        return tuple(colors[counts.argmax()])

    assert bg_color(frames[1]) == (255, 0, 0), "initial wallpaper not shown"
    assert bg_color(frames[-1]) == (0, 0, 255), (
        "wallpaper change mid-run was not picked up"
    )


def test_obs_host_example(tmp_path):
    """The packaged OBS-equivalent consumer artifact stays runnable
    (docs/examples/obs_host.py; lifecycle of glava-obs/entry.c)."""
    import runpy
    import sys

    out = tmp_path / "sheet.png"
    argv = sys.argv
    sys.argv = ["obs_host.py", str(out)]
    try:
        runpy.run_path("docs/examples/obs_host.py", run_name="__main__")
    finally:
        sys.argv = argv
    img = sinks.read_png(out)
    assert img.shape[0] == 360 and img.shape[1] == 1920
    # the visualizer composited something over the dark canvas
    assert (img[..., :3].max(axis=-1) > 40).any()


def test_batched_matches_single_with_xroot_opacity(tmp_path):
    """The batched raster applies the same background composite as the
    single-stream step (xroot/none opacity); previously batched frames
    came out straight-alpha."""
    import jax.numpy as jnp

    from glava_tpu.renderer import Renderer

    wall = np.zeros((32, 48, 4), np.uint8)
    wall[..., 0] = 200
    wall[..., 3] = 255
    wp = tmp_path / "w.png"
    sinks.write_png(wp, wall[::-1])
    lc = loader.load(
        cli_requests=("setgeometry 0 0 48 32", "setbufsize 1024",
                      "setsamplesize 256", "setprintframes false",
                      'setopacity "xroot"', f'setbgimg "{wp}"'),
        force_module="bars",
    )
    r = Renderer(lc)
    br = BatchedRenderer(lc, n_streams=2)
    rng = np.random.default_rng(0)
    snap = jnp.asarray(rng.standard_normal((2, 1024)).astype(np.float32) * 0.3)
    ss, sb = r.init_state(), br.init_state()
    step_s = r.jit_step()
    step_b = jax.jit(br.step)
    for _ in range(4):
        ss, fs = step_s(ss, snap, True, np.float32(0.0), np.float32(1.0),
                        np.float32(0.05), {})
        sb, fb = step_b(
            sb, jnp.stack([snap, snap]), jnp.ones(2, bool),
            jnp.zeros(2, jnp.float32), jnp.ones(2, jnp.float32),
            jnp.full(2, 0.05, jnp.float32), {},
        )
    np.testing.assert_allclose(np.asarray(fb[0]), np.asarray(fs), atol=1e-6)
    np.testing.assert_allclose(np.asarray(fb[1]), np.asarray(fs), atol=1e-6)
    # the wallpaper shows through undrawn pixels
    assert (np.asarray(fs)[..., 0] >= 200 / 255 - 1e-3).any()


def test_read_png_python_fallback(tmp_path, monkeypatch):
    """read_png's pure-Python unfilter path (no native lib) matches."""
    from glava_tpu import native as native_mod

    rng = np.random.default_rng(13)
    frame = rng.integers(0, 256, (9, 11, 4), dtype=np.uint8)
    p = tmp_path / "rt.png"
    sinks.write_png(p, frame)
    monkeypatch.setattr(native_mod, "png_unfilter", lambda *a: None)
    back = sinks.read_png(p)
    np.testing.assert_array_equal(back, frame[::-1])


def test_offline_render_deterministic(tmp_path):
    """Offline rendering follows the exact realtime schedule and is
    deterministic for a given track + config."""
    import wave as _wave

    from glava_tpu.runtime.offline import render_wav

    rate = 22050
    t = np.arange(rate) / rate  # 1 second
    sig = (0.4 * np.sin(2 * np.pi * 523 * t) * 32767).astype("<i2")
    wav = tmp_path / "tone.wav"
    with _wave.open(str(wav), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(sig.tobytes())

    lc = loader.load(
        cli_requests=("setgeometry 0 0 64 48", "setbufsize 1024",
                      "setsamplesize 256", "setprintframes false"),
        force_module="bars",
    )

    def run():
        got = []
        render_wav(lc, str(wav), sinks.CallbackSink(
            lambda f, t: got.append(f.copy())), fps=24.0, chunk=16)
        return got

    a, b = run(), run()
    assert len(a) == 24  # 1 s at 24 fps
    assert any((f[..., 3] > 0).any() for f in a[6:])  # bars drawn
    for fa, fb in zip(a, b):
        np.testing.assert_array_equal(fa, fb)


def test_async_sink_never_blocks_and_drops_oldest():
    """AsyncSink decouples slow consumers: the render side never
    blocks; under backpressure the oldest pending frames drop."""
    import time as _t

    seen = []

    class SlowSink(sinks.FrameSink):
        def submit(self, frame, time_s):
            _t.sleep(0.05)
            seen.append(int(frame[0, 0, 0]))

    s = sinks.AsyncSink(SlowSink(), depth=2)
    t0 = _t.monotonic()
    for i in range(30):
        f = np.full((4, 4, 4), i, np.uint8)
        s.submit(f, 0.0)
    took = _t.monotonic() - t0
    assert took < 0.5, f"render side blocked for {took:.2f}s"
    s.close()
    assert s.dropped > 0
    assert seen, "consumer received frames"
    assert seen == sorted(seen), "frames delivered in order"
    assert seen[-1] == 29, "the newest frame is never dropped"


def test_async_sink_spec():
    s = sinks.make_sink("async:null")
    assert isinstance(s, sinks.AsyncSink)
    assert isinstance(s.inner, sinks.NullSink)
    s.submit(np.zeros((2, 2, 4), np.uint8), 0.0)
    s.close()   # drains the queue before closing the inner sink
    assert s.inner.count == 1


def test_engine_inflight_queue_preserves_order_and_drains():
    """Depth-4 in-flight queue: every rendered frame reaches the sink
    exactly once, in timestamp order, including the tail frames still
    queued when the loop exits (drained in the finally block)."""
    received = []
    eng = Engine(
        EngineOptions(audio_backend="synth", screen=(64, 48),
                      requests=("setprintframes false",), inflight=4),
        sink=sinks.CallbackSink(lambda f, t: received.append((t, f))),
    )
    eng.run(max_frames=7)
    assert eng.frames_rendered == 7
    assert len(received) == 7, "queued tail frames must drain on exit"
    ts = [t for t, _ in received]
    assert ts == sorted(ts), "frames must arrive oldest-first"
    assert received[-1][1].shape == (48, 64, 4)
