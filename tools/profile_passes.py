"""Per-pass TPU cost breakdown for the 1080p builtin frame.

Times (steady-state, frames-in-flight async dispatch, scalar-checksum sync
per DEVNOTES) each stage of the depth-3 frame separately:

  full          the whole animated frame (bench.py's measurement)
  closest0      one closest-hit pass on primary rays
  any0          one any-hit (shadow occlusion) pass from primary hit points
  kernel0       the scene megakernel alone on primary rays (no plane/XLA glue)
  raygen        camera ray generation alone
  glue          full - 3*closest - 2*any estimate printed for reference

Usage: python tools/profile_passes.py [--width W --height H --iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, args, iters=8, warmup=2):
    import jax.numpy as jnp

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
    p.add_argument("--tile-cols", type=int, default=0, help="override TILE_COLS")
    p.add_argument("--tile-rows", type=int, default=0, help="override TILE_ROWS")
    p.add_argument("--stages", type=str, default="full,closest0,any0,kernel0,raygen")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from gpuraytracer_tpu.accel import traverse
    from gpuraytracer_tpu.accel.instances import Scene, ray_to_blas
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
    results = {}

    @jax.jit
    def full(arrays):
        img = trace.render_frame(Scene(layout, arrays), W, H)
        return jnp.sum(img)

    @jax.jit
    def raygen(arrays):
        px, py = cam.pixel_grid(W, H)
        o, d = cam.generate_camera_rays(
            px, py, W, H,
            arrays.constants.camera_position, arrays.constants.projection_to_world,
        )
        return jnp.sum(o) + jnp.sum(d)

    def primary_rays(arrays):
        px, py = cam.pixel_grid(W, H)
        return cam.generate_camera_rays(
            px, py, W, H,
            arrays.constants.camera_position, arrays.constants.projection_to_world,
        )

    @jax.jit
    def closest0(arrays):
        o, d = primary_rays(arrays)
        hit = traverse.closest_hit(o, d, Scene(layout, arrays))
        return jnp.sum(hit.t) + jnp.sum(hit.normal) + jnp.sum(hit.geometry_id)

    @jax.jit
    def any0(arrays):
        o, d = primary_rays(arrays)
        hit = traverse.closest_hit(o, d, Scene(layout, arrays))
        hit_pos = o + hit.t[..., None] * d
        light = arrays.constants.light_position[:3]
        sd = hlsl.normalize(light - hit_pos)
        occ = traverse.any_hit(hit_pos, sd, Scene(layout, arrays), active=hit.hit)
        return jnp.sum(occ)

    @jax.jit
    def kernel0(arrays):
        o, d = primary_rays(arrays)
        o_blas, d_blas = ray_to_blas(o, d, arrays.blas_offset)
        active = jnp.ones(o.shape[:-1], dtype=bool)
        t0 = jnp.full(o.shape[:-1], 10000.0, dtype=o.dtype)
        params = scene_kernel.pack_params(arrays, arrays.constants.elapsed_time)
        geoms = tuple((int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types))
        best_t, normal, gid = scene_kernel.scene_closest_tiles(
            o_blas, d_blas, active, t0, *params, geoms=geoms, cull_backface=True,
        )
        return jnp.sum(jnp.where(jnp.isfinite(best_t), best_t, 0.0)) + jnp.sum(gid)

    fns = {
        "full": full, "closest0": closest0, "any0": any0,
        "kernel0": kernel0, "raygen": raygen,
    }
    for name in ("raygen", "kernel0", "closest0", "any0", "full"):
        if name not in stages:
            continue
        ms = timed(fns[name], (arrays,), iters=args.iters)
        results[name] = round(ms, 2)
        print(f"{name:10s} {ms:8.2f} ms", flush=True)

    if {"full", "closest0", "any0"} <= results.keys():
        # any0 includes one closest pass (to get hit points); subtract.
        any_only = results["any0"] - results["closest0"]
        glue = results["full"] - 3 * results["closest0"] - 2 * any_only
        print(f"{'any_only':10s} {any_only:8.2f} ms (any0 - closest0)")
        print(f"{'glue est':10s} {glue:8.2f} ms (full - 3*closest - 2*any)")
        results["any_only"] = round(any_only, 2)
        results["glue_est"] = round(glue, 2)

    print(json.dumps({"width": W, "height": H,
                      "tile_rows": scene_kernel.TILE_ROWS,
                      "tile_cols": scene_kernel.TILE_COLS, **results}))


if __name__ == "__main__":
    main()
