"""A/B the shifted-tap materialization barrier (GLAVA_TPU_PREV_MAT)
in ONE process (same compile session), interleaved per module, to beat
the fusion/drift lottery.

Motivation: TPU-HLO inspection showed XLA duplicating the producing
pass's expression into every shifted-window fusion of a neighbor-tap
pass (interpreted circle: ~12 fusions each re-reading ~85 MB of pass-1
operands). A per-channel lax.optimization_barrier on the tap source
forces one materialization every tap then slices. The CPU-proxy cost
analysis cannot see this (XLA CPU expands opt-barriers before fusion),
so this must run on the TPU.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_prevmat_ab.py [modules...]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import scripts.bench_interpreted as bi  # noqa: E402


def main():
    mods = sys.argv[1:] or ["circle", "graph_aa", "wave", "radial"]
    results = {}
    for m in mods:
        name, knobs = (m, "") if m != "graph_aa" else \
            ("graph", "#define ANTI_ALIAS 1\n")
        for mode in ("0", "1"):
            os.environ["GLAVA_TPU_PREV_MAT"] = mode
            fps = bi.bench_module(name, knobs)
            results[(m, mode)] = fps
            print(f"{m:10s} mat={mode}: {fps:8.1f} fps", flush=True)
    os.environ.pop("GLAVA_TPU_PREV_MAT", None)
    print(results)


if __name__ == "__main__":
    main()
