"""Sweep-integrated cost attribution for the HEADLINE window.

profile_fused's chained slope measures ONE animation phase; DEVNOTES
(round-3 session-7) showed march cost is strongly phase-dependent, so
single-phase knockouts can mis-rank levers for the 64-frame bench sweep
(t = 0..2.13, the light orbiting at -8 s/rev — Raytracing.hlsl:107-113).
This tool runs bench.py's EXACT scan window (one compile per variant)
with a level/shadow knockout, so differences attribute cost integrated
over the same phases the headline pays for:

    python tools/profile_sweep.py                  # full depth-3 frame
    python tools/profile_sweep.py --depth 2        # drop closest@2+shadow@1
    python tools/profile_sweep.py --depth 1        # primary closest only
    python tools/profile_sweep.py --no-shadows     # depth 3, occlusion off

Each knockout is a different program (fresh Mosaic compile ~100 s, then
cached in .jax_cache). Reference frame-stats analog: Renderer.cpp:374-399.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--chain", type=int, default=64)
    p.add_argument("--depth", type=int, default=0, help="0 = reference 3")
    p.add_argument("--no-shadows", action="store_true")
    args = p.parse_args()

    import bench

    if args.no_shadows:
        from gpuraytracer_tpu.kernels import frame_kernel

        frame_kernel.PROFILE_NO_SHADOWS = True
    if args.depth:
        from gpuraytracer_tpu.render import trace

        real = trace.render_frame

        def patched(scene, width, height, *, max_depth=None):
            return real(scene, width, height, max_depth=args.depth)

        trace.render_frame = patched

    result = bench.run_bench(args.width, args.height, args.frames,
                             warmup=2, chain=args.chain)
    result["knockout"] = {
        "depth": args.depth or 3, "no_shadows": args.no_shadows,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
