"""Prewarm the persistent compile cache for the round-end driver runs.

Compiles (and once executes) the EXACT programs the driver measures:
  1. bench.py's scanned 64-frame 1080p builtin window (TPU) — a fresh
     Mosaic compile of the fused frame kernels is minutes; a stale cache
     would make the driver's bench measure compiles, not frames. The
     chain length is part of the program (lax.scan trip count), so this
     default MUST track bench.py's.
  2. __graft_entry__.entry()'s 256x144 render (the compile check).

Run this after ANY kernel/shape change, before the round ends:

    python tools/prewarm.py            # bench program (TPU)
    python tools/prewarm.py --entry    # + the entry() program

Exits non-zero if the bench program fails to compile/run, so CI can gate
on it.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--entry", action="store_true",
                   help="also prewarm __graft_entry__.entry()")
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--chain", type=int, default=64)
    args = p.parse_args()

    t0 = time.perf_counter()
    import bench

    # One window = the full jit program bench.py times (window count only
    # changes the Python-level dispatch loop, not the compiled program).
    result = bench.run_bench(
        width=args.width, height=args.height, frames=args.chain,
        warmup=1, chain=args.chain,
    )
    print(f"prewarm: bench program compiled+ran in "
          f"{time.perf_counter() - t0:.1f}s "
          f"({result['detail']['frame_ms']} ms/frame warm)")

    if args.entry:
        t1 = time.perf_counter()
        import jax

        import __graft_entry__ as g

        fn, ex_args = g.entry()
        out = jax.jit(fn)(*ex_args)
        jax.block_until_ready(out)
        print(f"prewarm: entry() compiled+ran in {time.perf_counter() - t1:.1f}s")


if __name__ == "__main__":
    main()
