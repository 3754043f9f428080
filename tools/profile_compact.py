"""Two-round compacted frame device-time (slope) + dirty-count stats.

Chains N animated compacted frames in one program; slope = per-frame
device time (the ~25 ms per-dispatch tunnel floor cancels — DEVNOTES).

  --budget N     round-1 SDF march cap (GPURT_COMPACT_BUDGET analog)
  --cap-div N    queue capacity = lanes / N
  --counts       also report per-frame dirty-lane counts (extra program)
  --plain        measure render_frame_tiles instead (baseline comparison)

Usage: python tools/profile_compact.py [--n 4] [--budget 64] ...
"""

from __future__ import annotations

import argparse
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
    p.add_argument("--budget", type=str, default="",
                   help="SDF march cap: N or CLOSEST,SHADOW")
    p.add_argument("--mb-budget", type=str, default="",
                   help="metaball march cap: N or CLOSEST,SHADOW")
    p.add_argument("--cap-div", type=int, default=0)
    p.add_argument("--counts", action="store_true")
    p.add_argument("--plain", action="store_true")
    p.add_argument("--defer", action="store_true", dest="defer_shadow",
                   help="deferred-shadow mode (render_frame_deferred)")
    p.add_argument("--shadow-cap", type=int, default=0)
    p.add_argument("--qsort", type=str, default="block-code",
                   choices=["code", "raster", "block-code"])
    p.add_argument("--clusters", type=int, default=0,
                   help="re-cluster the scene with this leaf size "
                        "(visit-overhead experiment; 0 = layout default)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpuraytracer_tpu.kernels import frame_kernel
    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.models import builtin

    if args.cap_div:
        frame_kernel.COMPACT_CAP_DIV = args.cap_div

    W, H = args.width, args.height
    scene0 = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    layout = scene0.layout
    if args.clusters:
        import dataclasses

        import numpy as np

        from gpuraytracer_tpu.accel import bvh

        layout = dataclasses.replace(
            layout,
            clusters=bvh.build_clusters(
                np.asarray(scene0.arrays.aabb_min),
                np.asarray(scene0.arrays.aabb_max),
                leaf_size=args.clusters,
            ),
        )
    arrays = scene0.arrays

    def parse_cap(s):
        if not s:
            return None
        parts = [int(x) for x in s.split(",")]
        return parts[0] if len(parts) == 1 else tuple(parts)

    budget = parse_cap(args.budget) or frame_kernel.COMPACT_BUDGET
    mb_budget = parse_cap(args.mb_budget)

    def one_frame(a, t):
        ai = builtin.animate_arrays(a, t)
        smem_args, kw = frame_kernel.pack_frame_params(Scene(layout, ai))
        if args.plain:
            return frame_kernel.render_frame_tiles(
                *smem_args, width=W, height=H, max_depth=3,
                cull_backface=True, **kw,
            )
        if args.defer_shadow:
            return frame_kernel.render_frame_deferred(
                *smem_args, width=W, height=H, max_depth=3,
                cull_backface=True, qsort=args.qsort,
                shadow_cap=args.shadow_cap or None, **kw,
            )
        return frame_kernel.render_frame_compact(
            *smem_args, width=W, height=H, max_depth=3,
            cull_backface=True, budget_cap=budget, mb_budget_cap=mb_budget,
            **kw,
        )

    def make(n):
        @jax.jit
        def f(a):
            acc = jnp.float32(0.0)
            for i in range(n):
                acc = acc + jnp.sum(one_frame(a, 0.033 * (i + 1)))
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

    out = {
        "width": W, "height": H, "n": args.n,
        "defer": args.defer_shadow, "shadow_cap": args.shadow_cap or "default",
        "qsort": args.qsort,
        "budget": budget, "mb_budget": mb_budget,
        "cap_div": frame_kernel.COMPACT_CAP_DIV,
        "clusters": args.clusters or "layout",
        "plain": args.plain,
    }

    if args.counts and not args.plain:
        @jax.jit
        def count_frame(a, t):
            ai = builtin.animate_arrays(a, t)
            smem_args, kw = frame_kernel.pack_frame_params(Scene(layout, ai))
            if args.defer_shadow:
                _, c = frame_kernel.render_frame_deferred(
                    *smem_args, width=W, height=H, max_depth=3,
                    cull_backface=True, shadow_cap=args.shadow_cap or None,
                    debug_count=True, **kw,
                )
                return c
            _, c = frame_kernel.render_frame_compact(
                *smem_args, width=W, height=H, max_depth=3,
                cull_backface=True, budget_cap=budget,
                mb_budget_cap=mb_budget, debug_count=True, **kw,
            )
            return c
        counts = [int(count_frame(arrays, 0.033 * (i + 1))) for i in range(4)]
        lanes = W * H
        out["dirty_counts"] = counts
        out["dirty_frac"] = [round(c / lanes, 4) for c in counts]

    t1 = timed(make(1))
    tn = timed(make(args.n))
    slope = (tn - t1) / (args.n - 1)
    out.update({
        "t1_ms": round(t1, 2), "tN_ms": round(tn, 2),
        "frame_device_ms": round(slope, 2),
    })
    print(json.dumps(out))


if __name__ == "__main__":
    main()
