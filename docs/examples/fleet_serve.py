"""Serving a heterogeneous visualizer fleet from one chip.

The deployment mode the reference cannot express (one process = one
window): N independent audio sources, different modules and colors per
stream, one jitted device program per frame, each stream's frames
flowing to its own sink. Run it headless:

    python docs/examples/fleet_serve.py

What it demonstrates:

* `FleetEngine` + `StreamSpec`: per-stream audio sources, sinks, and
  live `--pipe`-style uniforms;
* heterogeneous modules (`StreamSpec(loaded=...)`): bars + radial +
  wave streams rendered in a single program (MixedBatchedRenderer
  dedupes their spectrum chains and groups rasters per variant);
* live per-stream updates without recompilation (`set_pipe`);
* per-stream frame handles (`tex`).
"""

from __future__ import annotations

import numpy as np

from glava_tpu.config import loader
from glava_tpu.runtime.fleet import FleetEngine, StreamSpec
from glava_tpu.runtime.sinks import write_png


def _loaded(module: str):
    return loader.load(
        cli_requests=("setgeometry 0 0 288 288", "setprintframes false",
                      "setbufsize 2048", "setsamplesize 512"),
        force_module=module,
    )


def main(out: str = "fleet_serve_demo.png") -> None:
    bars = _loaded("bars")
    streams = [
        StreamSpec("bass", source="synth:110,220",
                   pipe={"fg": (1.0, 0.3, 0.1, 1.0), "bg": (0, 0, 0, 0)}),
        StreamSpec("mids", source="synth:440,880", loaded=_loaded("radial")),
        StreamSpec("top", source="synth:1760,3520", loaded=_loaded("wave")),
    ]
    fleet = FleetEngine(bars, streams)
    fleet.set_pipe(0, "fg", (0.2, 0.9, 0.4, 1.0))  # live recolor, no re-jit
    fleet.run(max_frames=30, max_seconds=60.0)

    tiles = [fleet.tex(i) for i in range(len(streams))]
    assert all(t is not None and (t[..., 3] > 0).any() for t in tiles)
    sheet = np.concatenate(tiles, axis=1)
    write_png(out, sheet)
    print(f"wrote {out} ({sheet.shape[1]}x{sheet.shape[0]}), "
          f"fleet ups(mean)={float(np.mean(fleet.ups)):.1f}")


if __name__ == "__main__":
    import sys

    main(*sys.argv[1:2])
