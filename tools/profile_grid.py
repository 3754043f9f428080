"""Device-slope profiling for the analytic-grid config's visit overhead
(VERDICT round-2 item 2): the 16-instance closed-form scene spends its
frame almost entirely in per-(tile, geometry) gate/branch fixed costs.

Variants:
  --variant flat        layout as built (flat traversal, batched cheap run)
  --variant nobatch     GPURT_NO_BATCH_CHEAP=1 control (round-2 behavior)
  --variant cluster8    force 2 spatial clusters (leaf 8) onto the layout
  --variant cluster4    force 4 spatial clusters (leaf 4)

Methodology: chained-frame slope (DEVNOTES) — device ms/frame =
(t_N - t_1) / (N - 1) with a 1e-6 camera perturbation per chained frame so
XLA cannot CSE the frames.

Usage: python tools/profile_grid.py --variant flat [--n 4] [--scale 1.0]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--variant", type=str, default="flat",
                   choices=["flat", "nobatch", "cluster8", "cluster4"])
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tile-rows", type=int, default=0)
    p.add_argument("--tile-cols", type=int, default=0)
    p.add_argument("--cheap-run", type=int, default=0)
    p.add_argument("--depth", type=int, default=0,
                   help="override max_depth (cost attribution)")
    p.add_argument("--no-shadows", action="store_true",
                   help="skip occlusion traversals (cost attribution)")
    args = p.parse_args()

    if args.no_shadows:
        from gpuraytracer_tpu.kernels import frame_kernel

        frame_kernel.PROFILE_NO_SHADOWS = True

    if args.variant == "nobatch":
        os.environ["GPURT_NO_BATCH_CHEAP"] = "1"
    if args.tile_rows or args.tile_cols or args.cheap_run:
        from gpuraytracer_tpu.kernels import megakernel, scene_kernel

        if args.tile_rows:
            scene_kernel.TILE_ROWS = megakernel.TILE_ROWS = args.tile_rows
            scene_kernel.TILE_AUTO = False
        if args.tile_cols:
            scene_kernel.TILE_COLS = megakernel.TILE_COLS = args.tile_cols
            scene_kernel.TILE_AUTO = False
        if args.cheap_run:
            scene_kernel.CHEAP_RUN_MAX = args.cheap_run

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from gpuraytracer_tpu.accel import bvh
    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.models.scenes import get_config
    from gpuraytracer_tpu.render import trace

    cfg = get_config("analytic_grid_720p")
    W = max(8, int(cfg.width * args.scale))
    H = max(8, int(cfg.height * args.scale))
    builder = cfg.builder()
    scene0 = builder.build(W / H, 0.0)
    layout = scene0.layout
    if args.variant in ("cluster8", "cluster4"):
        leaf = 8 if args.variant == "cluster8" else 4
        clusters = bvh.build_clusters(
            np.asarray(scene0.arrays.aabb_min),
            np.asarray(scene0.arrays.aabb_max),
            leaf_size=leaf,
        )
        layout = dataclasses.replace(layout, clusters=clusters)
        print(f"clusters: {clusters}")
    animate = builder.animator()

    def make(n):
        @jax.jit
        def f(a):
            acc = jnp.float32(0.0)
            for i in range(n):
                ai = animate(a, 0.033 * i)
                ci = dataclasses.replace(
                    ai.constants,
                    camera_position=ai.constants.camera_position
                    + jnp.float32(1e-6) * (i + 1),
                )
                ai = dataclasses.replace(ai, constants=ci)
                img = trace.render_frame(Scene(layout, ai), W, H,
                                         max_depth=args.depth or cfg.max_depth)
                acc = acc + jnp.sum(img)
            return acc
        return f

    f1, fn = make(1), make(args.n)
    a0 = scene0.arrays
    t0 = time.perf_counter()
    float(f1(a0))
    print(f"compile 1-frame: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    float(fn(a0))
    print(f"compile {args.n}-frame: {time.perf_counter() - t0:.1f}s")

    def timed(f):
        best = 1e9
        for _ in range(args.reps):
            t0 = time.perf_counter()
            float(f(a0))
            best = min(best, time.perf_counter() - t0)
        return best * 1e3

    t1, tn = timed(f1), timed(fn)
    slope = (tn - t1) / (args.n - 1)
    mrays = W * H / slope / 1e3
    print(f"variant={args.variant} {W}x{H} wall1={t1:.1f}ms "
          f"wall{args.n}={tn:.1f}ms device_slope={slope:.2f}ms "
          f"mrays_dispatch={mrays:.1f}")


if __name__ == "__main__":
    main()
