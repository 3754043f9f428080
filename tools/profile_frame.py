"""Decompose the real frame cost by depth/shadow knockouts.

frame(d) = d closest passes + (d-1 <bounded by levels) shadow passes + glue:
  d=1: 1 closest, 0 shadow
  d=2: 2 closest, 1 shadow
  d=3: 3 closest, 2 shadow (the reference depth)
noshadow(d=3): 3 closest, 0 shadow (trace_shadow forced off)

Increments isolate per-pass in-frame costs without tunnel-floor bias
(every variant is one dispatch; differences between variants are device
time — the ~24 ms host floor cancels).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=8, warmup=2):
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
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--tile-cols", type=int, default=0)
    p.add_argument("--tile-rows", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gpuraytracer_tpu.accel.instances import Scene
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
    results = {}

    def make_frame(depth):
        @jax.jit
        def f(arrays):
            img = trace.render_frame(Scene(layout, arrays), W, H, max_depth=depth)
            return jnp.sum(img)
        return f

    def make_frame_noshadow(depth):
        # trace.py binds any_hit at import; patch ITS reference while
        # tracing (jit traces on first call, inside timed()'s warmup).
        import gpuraytracer_tpu.render.trace as trm

        def no_any_hit(o, d, scene, **kw):
            return jnp.zeros(o.shape[:-1], dtype=bool)

        def f(arrays):
            img = trm.render_frame(Scene(layout, arrays), W, H, max_depth=depth)
            return jnp.sum(img)

        jf = jax.jit(f)

        def run(arrays):
            orig = trm.any_hit
            trm.any_hit = no_any_hit
            try:
                return jf(arrays)
            finally:
                trm.any_hit = orig

        return run

    for d in (1, 2, 3):
        ms = timed(make_frame(d), (arrays,), iters=args.iters)
        results[f"frame_d{d}"] = round(ms, 2)
        print(f"frame d={d}: {ms:8.2f} ms", flush=True)

    ms = timed(make_frame_noshadow(3), (arrays,), iters=args.iters)
    results["frame_d3_noshadow"] = round(ms, 2)
    print(f"frame d=3 noshadow: {ms:8.2f} ms", flush=True)

    d1, d2, d3 = results["frame_d1"], results["frame_d2"], results["frame_d3"]
    print(f"closest@1+shadow@0 = {d2-d1:7.2f} ms")
    print(f"closest@2+shadow@1 = {d3-d2:7.2f} ms")
    print(f"both shadows       = {d3-results['frame_d3_noshadow']:7.2f} ms")
    print(json.dumps({"width": W, "height": H,
                      "tile": [scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS],
                      **results}))


if __name__ == "__main__":
    main()
