"""A/B the few-valued compact re-index for static lookups in ONE
process (same compile session), interleaved per module + round.

Motivation: the merged branch-pair fetch (radial's l/r select) builds
a 2*sz+1-entry table but its index plane holds only ~NBARS+2 distinct
values; the sorted-block static lookup's cost scales with the chunk
WINDOW each block must read, so re-indexing through np.unique turns a
17-chunk lookup into a 1-2-chunk one (_compact_static_fetch in
config/glsl_shader.py). This interleaves compaction on/off builds
round-robin to beat the weather/lottery.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u \
        scripts/exp_compact_lk_ab.py [modules...] [--rounds N]
"""

import sys

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

import scripts.bench_interpreted as bi  # noqa: E402

from glava_tpu.config import glsl_shader  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    rounds = 2
    for a in sys.argv[1:]:
        if a.startswith("--rounds"):
            rounds = int(a.split("=", 1)[1])
    mods = args or ["radial", "circle", "bars"]
    default_max = glsl_shader._COMPACT_LK_MAX
    results = {}
    for rd in range(rounds):
        for m in mods:
            name, knobs = (m, "") if m != "graph_aa" else \
                ("graph", "#define ANTI_ALIAS 1\n")
            for label, cap in (("compact", default_max), ("raw", 0)):
                glsl_shader._COMPACT_LK_MAX = cap
                fps = bi.bench_module(name, knobs, builds=1)
                results.setdefault((m, label), []).append(round(fps, 1))
                print(f"r{rd} {m:10s} {label:8s}: {fps:8.1f} fps",
                      flush=True)
    glsl_shader._COMPACT_LK_MAX = default_max
    print(results)


if __name__ == "__main__":
    main()
