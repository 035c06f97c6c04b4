"""The honest-timing helpers (glava_tpu/utils/timing.py).

The adaptive slope exists because the axon tunnel's probe-fetch RTT
varies by tens of ms while a sub-ms raster contributes only
(n2 - n1) * ~1 ms of signal at the fixed run lengths: the "fusion
lottery" spread across fresh builds of identical code was pure
measurement noise (two fresh interpreted-wave builds fingerprint to
byte-identical StableHLO AND optimized HLO — docs/STATUS.md round 5).
These tests pin the scaling behavior with a deterministic fake clock.
"""

import numpy as np

from glava_tpu.utils.timing import slope_time


def _noisy_run(per_call: float, jitter: float, seed: int = 0):
    rng = np.random.default_rng(seed)
    calls = []

    def run(k: int) -> float:
        calls.append(k)
        return per_call * k + 0.03 + float(rng.uniform(-jitter, jitter))

    return run, calls


def test_fixed_protocol_is_jitter_dominated():
    run, _ = _noisy_run(1e-3, 0.01)
    vals = [slope_time(run, 3, 9, 2) for _ in range(8)]
    assert max(vals) / min(vals) > 1.5  # the lottery, reproduced


def test_target_delta_scales_until_signal_dominates():
    run, calls = _noisy_run(1e-3, 0.01, seed=1)
    vals = [slope_time(run, 3, 9, 2, target_delta=0.25)
            for _ in range(8)]
    assert max(vals) / min(vals) < 1.2
    assert all(abs(v - 1e-3) / 1e-3 < 0.15 for v in vals)
    assert max(calls) > 9  # it actually scaled the run lengths


def test_target_delta_respects_scale_cap():
    from glava_tpu.utils import timing

    run, calls = _noisy_run(1e-9, 0.0)  # delta never reached
    slope_time(run, 3, 9, 1, target_delta=10.0)
    assert max(calls) <= 9 * timing._SLOPE_SCALE_CAP


def test_env_knob_controls_default(monkeypatch):
    run, calls = _noisy_run(1e-3, 0.0)
    monkeypatch.setenv("GLAVA_TPU_SLOPE_DELTA_MS", "250")
    slope_time(run, 3, 9, 1)
    assert max(calls) > 9
    run2, calls2 = _noisy_run(1e-3, 0.0)
    monkeypatch.setenv("GLAVA_TPU_SLOPE_DELTA_MS", "0")
    slope_time(run2, 3, 9, 1)
    assert max(calls2) == 9
    # malformed values fall back to the fixed protocol
    run3, calls3 = _noisy_run(1e-3, 0.0)
    monkeypatch.setenv("GLAVA_TPU_SLOPE_DELTA_MS", "fast")
    slope_time(run3, 3, 9, 1)
    assert max(calls3) == 9
