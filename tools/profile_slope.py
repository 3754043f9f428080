"""Marginal per-pass device cost via chained passes in ONE program.

The remote-TPU tunnel imposes a ~24 ms host floor per dispatch, so
single-pass timings are host-bound (tools/profile_passes.py showed raygen
== 24.5 ms). Here each measurement chains N data-dependent passes inside
one jitted program; the slope (t_N - t_1)/(N - 1) is pure device time.

Usage: python tools/profile_slope.py [--n 4] [--tile-cols N] [--stages ...]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=6, warmup=2):
    for _ in range(warmup):
        float(fn(*args))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    for o in outs:
        float(o)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--tile-cols", type=int, default=0)
    p.add_argument("--tile-rows", type=int, default=0)
    p.add_argument("--stages", type=str, default="closest,any,frame")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gpuraytracer_tpu.accel import traverse
    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.core import camera as cam
    from gpuraytracer_tpu.core import hlsl
    from gpuraytracer_tpu.kernels import scene_kernel
    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.render import trace

    if args.tile_cols:
        scene_kernel.TILE_COLS = args.tile_cols
    if args.tile_rows:
        scene_kernel.TILE_ROWS = args.tile_rows

    W, H = args.width, args.height
    scene0 = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    layout = scene0.layout
    arrays = scene0.arrays
    stages = set(args.stages.split(","))
    N = args.n
    results = {}

    def primary_rays(arrays):
        px, py = cam.pixel_grid(W, H)
        return cam.generate_camera_rays(
            px, py, W, H,
            arrays.constants.camera_position, arrays.constants.projection_to_world,
        )

    def make_chain_closest(n):
        @jax.jit
        def f(arrays):
            o, d = primary_rays(arrays)
            acc = jnp.float32(0.0)
            for i in range(n):
                hit = traverse.closest_hit(o, d, Scene(layout, arrays))
                acc = acc + jnp.sum(jnp.where(hit.hit, hit.t, 0.0))
                # Data dependency so XLA cannot CSE the passes: bounce the
                # rays off the hit points.
                o = o + hit.t[..., None] * d
                d = hlsl.reflect(d, hit.normal + 1e-7 * i)
            return acc
        return f

    def make_chain_any(n):
        @jax.jit
        def f(arrays):
            o, d = primary_rays(arrays)
            hit = traverse.closest_hit(o, d, Scene(layout, arrays))
            pos = o + hit.t[..., None] * d
            light = arrays.constants.light_position[:3]
            acc = jnp.float32(0.0)
            for i in range(n):
                sd = hlsl.normalize(light - pos + 1e-6 * i)
                occ = traverse.any_hit(pos, sd, Scene(layout, arrays), active=hit.hit)
                acc = acc + jnp.sum(occ)
                pos = pos + 1e-7 * acc  # dependency
            return acc
        return f

    def make_chain_frame(n):
        @jax.jit
        def f(arrays):
            acc = jnp.float32(0.0)
            for i in range(n):
                a = builtin.animate_arrays(arrays, 0.033 * (i + 1))
                img = trace.render_frame(Scene(layout, a), W, H)
                acc = acc + jnp.sum(img)
            return acc
        return f

    makers = {"closest": make_chain_closest, "any": make_chain_any,
              "frame": make_chain_frame}
    for name in ("closest", "any", "frame"):
        if name not in stages:
            continue
        t1 = timed(makers[name](1), (arrays,), iters=args.iters)
        tn = timed(makers[name](N), (arrays,), iters=args.iters)
        slope = (tn - t1) / (N - 1)
        results[f"{name}_slope_ms"] = round(slope, 2)
        results[f"{name}_t1"] = round(t1, 2)
        results[f"{name}_tN"] = round(tn, 2)
        print(f"{name:8s} t1={t1:7.2f}  t{N}={tn:7.2f}  slope={slope:7.2f} ms/pass",
              flush=True)

    print(json.dumps({"width": W, "height": H, "n": N,
                      "tile": [scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS],
                      **results}))


if __name__ == "__main__":
    main()
