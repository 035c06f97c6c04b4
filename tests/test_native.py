"""Native ring/FIFO tests (skipped when the toolchain is unavailable)."""

import os
import threading
import time

import numpy as np
import pytest

from glava_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason=f"native lib unavailable: {native.build_error()}"
)


def test_ring_snapshot_and_modified():
    r = native.NativeRing(512)
    buf, mod = r.snapshot()
    assert not mod and buf.shape == (2, 512) and buf.max() == 0
    l = np.linspace(0, 1, 128, dtype=np.float32)
    r.push(l, -l)
    buf, mod = r.snapshot()
    assert mod
    np.testing.assert_allclose(buf[0, -128:], l)
    np.testing.assert_allclose(buf[1, -128:], -l)
    assert buf[0, 0] == 0  # zero-padded history
    _, mod2 = r.snapshot()
    assert not mod2


def test_ring_wraps_history():
    r = native.NativeRing(256)
    for k in range(10):
        r.push(np.full(100, float(k), np.float32), np.zeros(100, np.float32))
    buf, _ = r.snapshot()
    # trailing 100 samples come from the last push
    assert (buf[0, -100:] == 9.0).all()
    assert (buf[0, :56] == 7.0).all()  # 1000-256=744 -> sample 744 in push 7


def test_ring_mono_mixdown():
    r = native.NativeRing(64)
    r.push(np.ones(8, np.float32), np.full(8, 3.0, np.float32), mono=True)
    buf, _ = r.snapshot()
    assert (buf[0, -8:] == 2.0).all() and (buf[1, -8:] == 2.0).all()


def test_fifo_reader_end_to_end(tmp_path):
    path = str(tmp_path / "pipe")
    os.mkfifo(path)
    ring = native.NativeRing(2048)
    reader = native.NativeFifoReader(ring, path, hop=256)

    def writer():
        # stream roughly in real time so the pipe stays active while
        # the test snapshots
        with open(path, "wb") as f:
            t = np.arange(22050 * 2) / 22050.0
            s = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
            inter = np.empty(2 * len(s), dtype="<i2")
            inter[0::2] = s
            inter[1::2] = s
            for i in range(0, len(inter), 1024):
                f.write(inter[i : i + 1024].tobytes())
                f.flush()
                time.sleep(1024 / 2 / 22050.0)

    w = threading.Thread(target=writer)
    w.start()
    try:
        time.sleep(0.6)
        buf, mod = ring.snapshot()
        assert mod
        # reference scaling: s16/65535 -> ~0.305 peak for 20000
        assert 0.25 < np.abs(buf).max() < 0.35
        w.join()
        # writer closed -> silence synthesis keeps updates flowing
        u0 = ring.updates
        time.sleep(0.4)
        assert ring.updates > u0
        buf2, _ = ring.snapshot()
    finally:
        reader.stop()


def test_concurrent_push_snapshot_consistency():
    """Seqlock: concurrent snapshots are never torn (both channels from
    the same push when pushes write distinguishable values)."""
    r = native.NativeRing(1024)
    stop = threading.Event()

    def producer():
        k = 0
        while not stop.is_set():
            v = np.full(256, float(k % 1000), np.float32)
            r.push(v, v)
            k += 1

    p = threading.Thread(target=producer)
    p.start()
    try:
        for _ in range(200):
            buf, _ = r.snapshot()
            np.testing.assert_array_equal(buf[0], buf[1])
    finally:
        stop.set()
        p.join()


def test_rgba_to_yuv444_matches_python():
    rng = np.random.default_rng(4)
    frame = rng.integers(0, 256, size=(8, 12, 4), dtype=np.uint8)
    planes = native.rgba_to_yuv444(frame)
    assert planes is not None
    img = frame[::-1]
    r = img[..., 0].astype(np.float64)
    g = img[..., 1].astype(np.float64)
    b = img[..., 2].astype(np.float64)
    want = [
        0.299 * r + 0.587 * g + 0.114 * b,
        -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
        0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
    ]
    for got, w_ in zip(planes, want):
        diff = np.abs(got.astype(np.int16)
                      - np.clip(np.round(w_), 0, 255).astype(np.int16))
        assert diff.max() <= 1  # float rounding
