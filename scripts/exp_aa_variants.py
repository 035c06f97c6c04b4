"""Decompose interpreted graph+AA pass 3 (653 us @1080p) by lowering
variant: default (latch scan), GLAVA_TPU_LATCH=0 (rowwise-lookup
fallback for the fetch-at-walk-result), GLAVA_TPU_PALLAS_SCAN=0
(lax.cummin scans). Reports the pass-3 marginal cost per variant.

Run: PYTHONPATH=/root/repo:/root/.axon_site python -u scripts/exp_aa_variants.py
"""

import os
import sys

sys.path.insert(0, "/root/repo")

from glava_tpu.runtime.engine import _enable_compile_cache

_enable_compile_cache()

from scripts.profile_graph_aa import build_renderer, prefix_cost  # noqa: E402


def main():
    import jax

    print("backend:", jax.default_backend())
    for label, env in (
        ("default(latch)", {}),
        ("latch=0(lookup)", {"GLAVA_TPU_LATCH": "0"}),
        ("pallas_scan=0", {"GLAVA_TPU_PALLAS_SCAN": "0"}),
    ):
        for k, v in env.items():
            os.environ[k] = v
        try:
            r = build_renderer()
            c2 = prefix_cost(r, 2)
            c3 = prefix_cost(r, 3)
            print(f"{label:16s}: passes[:2] {c2*1e6:7.1f} us, "
                  f"[:3] {c3*1e6:7.1f} us, pass-3 marginal "
                  f"{(c3-c2)*1e6:7.1f} us", flush=True)
        finally:
            for k in env:
                os.environ.pop(k, None)


if __name__ == "__main__":
    main()
