"""Fused-frame device-time (slope) with kernel knob overrides.

Chains N animated fused frames in one program; slope = per-frame device
time (the ~25 ms per-dispatch tunnel floor cancels). Knobs:

  --budget N      override every SDF step budget (march-cost attribution:
                  budget 4 ~= the frame's march-independent fixed cost)
  --mb-steps N    override the metaball budget the same way
  --unroll-sdf N  marcher micro-steps per outer iteration
  --unroll-mb N

Overrides change rendered output (budget) or codegen (unroll) — profiling
only, never the default path. Run in a fresh process per knob setting
(module-level constants are read at trace time).

Usage: python tools/profile_fused.py [--n 4] [--budget N] ...
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--budget", type=int, default=0)
    p.add_argument("--mb-steps", type=int, default=0)
    p.add_argument("--unroll-sdf", type=int, default=0)
    p.add_argument("--unroll-shadow", type=int, default=0,
                   help="occlusion-march unroll (0 = UNROLL_SDF)")
    p.add_argument("--unroll-mb", type=int, default=0)
    p.add_argument("--tile-rows", type=int, default=0)
    p.add_argument("--tile-cols", type=int, default=0)
    p.add_argument("--halves", type=int, default=0,
                   help="march sub-tile column blocks (MARCH_HALVES)")
    p.add_argument("--shadow-inline", action="store_true",
                   help="inline-check marchers for occlusion traversals")
    p.add_argument("--no-shadows", action="store_true",
                   help="skip occlusion traversals (cost attribution)")
    p.add_argument("--t0", type=float, default=0.0,
                   help="animation time offset for the chained frames —"
                        " march/occlusion cost is phase-dependent (the"
                        " light orbits at -8 s/rev), so single-phase"
                        " slopes can mislead; probe several t0s")
    p.add_argument("--depth", type=int, default=0,
                   help="max recursion depth (0 = reference 3); chained-"
                        "slope depth knockouts attribute per-level cost"
                        " (d3-d2 = closest@2+shadow@1, d2-d1 = "
                        "closest@1+shadow@0)")
    p.add_argument("--tail", type=int, default=0,
                   help="straggler tail unroll (TAIL_UNROLL; 0 = off)")
    p.add_argument("--tail-thresh", type=int, default=0,
                   help="tail-phase lane threshold (TAIL_THRESH)")
    p.add_argument("--cheap-run", type=int, default=0,
                   help="cap closed-form batch runs (CHEAP_RUN_MAX)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpuraytracer_tpu.kernels import scene_kernel
    import gpuraytracer_tpu.core.types as types_mod

    if args.unroll_sdf:
        scene_kernel.UNROLL_SDF = args.unroll_sdf
    if args.unroll_shadow:
        scene_kernel.UNROLL_SDF_SHADOW = args.unroll_shadow
    if args.unroll_mb:
        scene_kernel.UNROLL_MB = args.unroll_mb
    if args.tile_rows:
        scene_kernel.TILE_ROWS = args.tile_rows
        scene_kernel.TILE_AUTO = False
    if args.tile_cols:
        scene_kernel.TILE_COLS = args.tile_cols
        scene_kernel.TILE_AUTO = False
    if args.mb_steps:
        # read at trace time by the marchers
        scene_kernel.METABALL_MAX_STEPS = args.mb_steps
    if args.halves:
        scene_kernel.MARCH_HALVES = args.halves
    if args.shadow_inline:
        scene_kernel.SHADOW_INLINE = True
    if args.no_shadows:
        from gpuraytracer_tpu.kernels import frame_kernel
        frame_kernel.PROFILE_NO_SHADOWS = True
    if args.tail:
        scene_kernel.TAIL_UNROLL = args.tail
    if args.tail_thresh:
        scene_kernel.TAIL_THRESH = args.tail_thresh
    if args.cheap_run:
        scene_kernel.CHEAP_RUN_MAX = args.cheap_run

    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.render import trace

    W, H = args.width, args.height
    scene0 = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    layout = scene0.layout
    if args.budget:
        g = len(layout.kinds)
        layout = dataclasses.replace(
            layout, step_budgets=tuple([args.budget] * g)
        )
    arrays = scene0.arrays

    def make(n):
        @jax.jit
        def f(a):
            acc = jnp.float32(0.0)
            for i in range(n):
                ai = builtin.animate_arrays(a, args.t0 + 0.033 * (i + 1))
                if args.depth:
                    img = trace.render_frame(Scene(layout, ai), W, H,
                                             max_depth=args.depth)
                else:
                    img = trace.render_frame(Scene(layout, ai), W, H)
                acc = acc + jnp.sum(img)
            return acc
        return f

    def timed(fn):
        for _ in range(2):
            float(fn(arrays))
        t0 = time.perf_counter()
        outs = [fn(arrays) for _ in range(args.iters)]
        for o in outs:
            float(o)
        return (time.perf_counter() - t0) / args.iters * 1e3

    t1 = timed(make(1))
    tn = timed(make(args.n))
    slope = (tn - t1) / (args.n - 1)
    print(json.dumps({
        "width": W, "height": H, "n": args.n,
        "budget": args.budget or "ref", "mb_steps": args.mb_steps or "ref",
        "depth": args.depth or 3,
        "unroll_sdf": scene_kernel.UNROLL_SDF,
        "unroll_shadow": scene_kernel.UNROLL_SDF_SHADOW,
        "unroll_mb": scene_kernel.UNROLL_MB,
        "halves": scene_kernel.MARCH_HALVES,
        "shadow_inline": scene_kernel.SHADOW_INLINE,
        "tile": [scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS],
        "t1_ms": round(t1, 2), "tN_ms": round(tn, 2),
        "frame_device_ms": round(slope, 2),
    }))


if __name__ == "__main__":
    main()
