#!/usr/bin/env python
"""Engine fps vs in-flight queue depth (synchronous frame-fetch loop).

Measures the live Engine loop (synth audio, null sink, frame limiter
off) at in-flight depths 0/1/2/4/8. Each frame's D2H fetch happens in
the loop (np.asarray in the dequeue), so depth d overlaps the fetch of
frame k with the device compute of frames k+1..k+d. On this
environment the fetch crosses a ~60 ms-RTT tunnel, which caps the
depth-0 rate; locally-attached chips see the device_step_ms floor from
bench.py instead. Prints one JSON line {depth: fps}.
"""

import json
import sys
import time

sys.path.insert(0, ".")


def run_depth(depth: int, seconds: float = 8.0, wire: str = "rgba8",
              geometry: str = "512 256") -> float:
    from glava_tpu.runtime.engine import Engine, EngineOptions
    from glava_tpu.runtime.sinks import FrameSink, make_sink

    opts = EngineOptions(
        requests=(f"setgeometry 0 0 {geometry}", "setframerate 0",
                  "setprintframes false"),
        force_module="bars",
        audio_backend="synth",
        inflight=depth,
    )
    if wire == "yuv420":
        # null sink that requests device-packed planes: the engine's
        # dequeue still performs the (now 2.7x smaller) D2H fetch
        class _NullYuv(FrameSink):
            wire_format = "yuv420"

            def submit(self, frame, time_s):
                pass

        sink = _NullYuv()
    else:
        sink = make_sink("null")
    eng = Engine(opts, sink=sink)
    t0 = time.monotonic()
    eng.run(max_seconds=seconds)
    dt = time.monotonic() - t0
    return eng.frames_rendered / dt


def main() -> None:
    from glava_tpu.runtime.engine import _enable_compile_cache

    _enable_compile_cache()
    out = {}
    for depth in (0, 1, 2, 4, 8):
        try:
            out[str(depth)] = round(run_depth(depth), 1)
            print(f"depth {depth}: {out[str(depth)]} fps", file=sys.stderr)
        except Exception as e:
            out[str(depth)] = None
            print(f"depth {depth}: FAILED {e}", file=sys.stderr)
    # wire-format comparison at the saturating depth: RGBA8 vs
    # device-packed YUV420 (1.5 B/px) on the same loop
    for geom, tag in (("512 256", "512x256"), ("1920 1080", "1080p")):
        for wire in ("rgba8", "yuv420"):
            key = f"wire_{tag}_{wire}"
            try:
                out[key] = round(run_depth(1, wire=wire, geometry=geom), 1)
                print(f"{key}: {out[key]} fps", file=sys.stderr)
            except Exception as e:
                out[key] = None
                print(f"{key}: FAILED {e}", file=sys.stderr)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
