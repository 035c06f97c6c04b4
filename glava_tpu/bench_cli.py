"""`glava-tpu-bench`: kernel microbenchmarks + wisdom autotuning.

Plays the role of GLFFT's ``bench()``/wisdom harness
(glfft/glfft.hpp:94-112, glfft_wisdom.hpp:91-146): measure the fused
update at the configured sizes, optionally learn and persist the best
batch tile.
"""

from __future__ import annotations

import argparse
import json


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="glava-tpu-bench")
    p.add_argument("--bufsize", type=int, default=4096)
    p.add_argument("--frames", type=int, default=5)
    p.add_argument("--batch", type=int, default=128)
    p.add_argument("--tune", action="store_true",
                   help="learn + persist the wisdom that governs the "
                        "live pipeline: best Pallas batch tile AND the "
                        "XLA-vs-Pallas path choice")
    p.add_argument("--streams", type=int, default=64,
                   help="stream count for the path head-to-head")
    args = p.parse_args(argv)

    from glava_tpu.ops import autotune

    if args.tune:
        # learn_path persists both the tile record and the path record
        rec = autotune.learn_path(args.bufsize, args.frames,
                                  streams=args.streams)
        # the presmooth dense<->banded crossover joins the search at
        # sizes where the banded form is plausible
        brec = None
        if args.bufsize >= 4096:
            try:
                brec = autotune.learn_banded(args.bufsize)
            except Exception as e:
                print(f"banded tune skipped: {e}",
                      file=__import__("sys").stderr)
        print(json.dumps({"tuned": rec, "banded": brec,
                          "wisdom": str(autotune.wisdom_path())}))
    else:
        result = autotune.learn_batch_tile(args.bufsize, args.frames,
                                           batch=args.batch)
        print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
