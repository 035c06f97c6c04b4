"""An OBS-plugin-equivalent host, end to end.

The reference's OBS source plugin (glava-obs/entry.c) drives GLava
through the libglava API: spawn `glava_entry` on a worker thread
(entry.c:111-115,149), `glava_wait` until the offscreen texture exists
(entry.c:158), swap the texture handle into the compositor's scene
(entry.c:159-166), push resize requests (entry.c:197-199), and
terminate+join on source destruction (entry.c:117-139).

This example replicates that exact lifecycle against glava_tpu's
frame-stream API and plays the compositor's role with a tiny scene
loop: each "OBS frame" it grabs the newest visualizer frame and
composites it into a canvas, then saves a contact sheet. Run it
headless:

    python docs/examples/obs_host.py [out.png]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import glava_tpu.api as glava
from glava_tpu.runtime.sinks import write_png


def main(out: str = "obs_host_demo.png") -> None:
    # source created (entry.c:216) -> spawn the engine worker thread
    h = glava.entry([
        "--audio", "synth",
        "-r", 'setsource "synth:330,660"',
        "--size", "320x180",
        "-r", "setprintframes false",
    ])
    glava.wait(h)  # entry.c:158: block until the first frame exists

    # the "scene": a dark canvas the visualizer composites into
    canvas = np.full((360, 640, 4), (16, 16, 24, 255), np.uint8)
    shots = []
    for obs_frame in range(12):          # video_render ticks (entry.c:203)
        frame = glava.tex(h)             # newest uint8 RGBA, bottom-up
        img = frame[::-1]                # compositor uses top-down
        hgt, wdt = img.shape[:2]
        y0, x0 = (360 - hgt) // 2, (640 - wdt) // 2
        region = canvas[y0:y0 + hgt, x0:x0 + wdt]
        a = img[..., 3:4].astype(np.float32) / 255.0
        region[:] = (img * a + region * (1.0 - a)).astype(np.uint8)
        if obs_frame == 5:
            # property change -> resize request (entry.c:197-199)
            glava.sizereq(h, 0, 0, 480, 270)
        if obs_frame % 4 == 3:
            shots.append(canvas.copy())
        time.sleep(0.1)

    # source destroyed (entry.c:117-139): terminate + join
    glava.terminate(h)
    assert not h.alive

    sheet = np.concatenate(shots, axis=1)
    write_png(out, sheet[::-1])  # writer expects bottom-up
    print(f"wrote {out} ({sheet.shape[1]}x{sheet.shape[0]})")


if __name__ == "__main__":
    main(*sys.argv[1:2])
