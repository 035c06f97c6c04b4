"""A/B/C the prev-halo designs in ONE process (same compile session)
to beat run-to-run fusion/drift lottery: for each interpreted module,
measure GLAVA_TPU_PREV_HALO in {"0", "zero", "both"}, interleaved.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_halo_ab.py [modules...]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import scripts.bench_interpreted as bi  # noqa: E402


def main():
    mods = sys.argv[1:] or ["circle", "graph_aa", "wave"]
    results = {}
    for m in mods:
        name, knobs = (m, "") if m != "graph_aa" else \
            ("graph", "#define ANTI_ALIAS 1\n")
        for mode in ("0", "zero", "both"):
            os.environ["GLAVA_TPU_PREV_HALO"] = mode
            fps = bi.bench_module(name, knobs)
            results[(m, mode)] = fps
            print(f"{m:10s} halo={mode:5s}: {fps:8.1f} fps", flush=True)
    os.environ.pop("GLAVA_TPU_PREV_HALO", None)
    print(results)


if __name__ == "__main__":
    main()
