"""A/B the lazy branch-merged table lookup (GLAVA_TPU_LAZY_LK) in ONE
process (same compile session), interleaved per module + round, to
beat the fusion/drift lottery.

Motivation: TPU-HLO ranking showed interpreted radial issuing ~16
full-plane lookup custom-calls vs the native module's ~9 — the
interpreter fetched audio_l and audio_r in separate branch lookups
where the native module folds the channel select into ONE
concatenated-table index. _LazyFetch (config/glsl_shader.py) defers
full-plane fetches and merges them on the numpy index plane across
masked assignments, flushing as one combined lookup.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
        scripts/exp_lazy_lk_ab.py [modules...] [--rounds N]
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import scripts.bench_interpreted as bi  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 2
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=", 1)[1])
    mods = args or ["radial", "circle"]
    results = {}
    for rd in range(rounds):
        for m in mods:
            name, knobs = (m, "") if m != "graph_aa" else \
                ("graph", "#define ANTI_ALIAS 1\n")
            for mode in ("0", ""):
                if mode:
                    os.environ["GLAVA_TPU_LAZY_LK"] = mode
                else:
                    os.environ.pop("GLAVA_TPU_LAZY_LK", None)
                label = "lazy" if mode == "" else "eager"
                fps = bi.bench_module(name, knobs, builds=1)
                results.setdefault((m, label), []).append(round(fps, 1))
                print(f"r{rd} {m:10s} {label:6s}: {fps:8.1f} fps",
                      flush=True)
    os.environ.pop("GLAVA_TPU_LAZY_LK", None)
    print(results)


if __name__ == "__main__":
    main()
