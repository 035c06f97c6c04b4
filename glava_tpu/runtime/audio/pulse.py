"""PulseAudio backend: float32 stereo capture from a sink monitor.

The reference blocks on ``pa_simple_read`` of float32 native-endian
stereo with fragsize = samplesize bytes from ``<default sink>.monitor``
(pulse_input.c:109-190). libpulse isn't a Python dependency here, so
capture is delegated to the ``parec``/``parecord`` CLI with identical
format flags; source discovery ("auto" -> default sink monitor) uses
``pactl``. Gated gracefully: a clear error if PulseAudio tooling is
absent (the reference exits likewise on connection failure,
pulse_input.c:128-135).
"""

from __future__ import annotations

import shutil
import subprocess

import numpy as np

from glava_tpu.runtime.audio import AudioBackend, AudioData, register


def _default_monitor() -> str:
    out = subprocess.run(
        ["pactl", "get-default-sink"], capture_output=True, text=True, timeout=5
    )
    sink = out.stdout.strip()
    if not sink:
        raise RuntimeError("could not discover default PulseAudio sink")
    return sink + ".monitor"


@register("pulseaudio")
class PulseBackend(AudioBackend):
    def init(self, audio: AudioData) -> None:
        if shutil.which("parec") is None and shutil.which("parecord") is None:
            raise RuntimeError(
                "PulseAudio capture requires `parec` (pulseaudio-utils); "
                "use the 'fifo', 'wav' or 'synth' backend instead"
            )
        if not audio.source or audio.source == "auto":
            audio.source = _default_monitor()

    def entry(self, audio: AudioData) -> None:
        tool = shutil.which("parec") or shutil.which("parecord")
        hop = audio.hop
        proc = subprocess.Popen(
            [
                tool,
                "-d", audio.source,
                "--format=float32ne",
                f"--rate={audio.rate}",
                "--channels=2",
                "--latency=" + str(hop * 2 * 4),
            ],
            stdout=subprocess.PIPE,
        )
        frame_bytes = hop * 2 * 4
        try:
            while not audio.terminate:
                data = proc.stdout.read(frame_bytes)
                if not data or len(data) < frame_bytes:
                    break
                s = np.frombuffer(data, dtype=np.float32)
                audio.push(s[0::2].copy(), s[1::2].copy())
        finally:
            proc.terminate()
