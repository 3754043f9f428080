"""Per-geometry cost attribution for the scene megakernel (TPU, 1080p).

Times the closest-hit scene kernel on primary rays with static geometry
SUBSETS — {analytic}, {metaballs}, {sdf w/o pyramid}, {pyramid}, {all} —
to localize where the ~24 ms/pass goes. Subsets share the tile grid and
plane bound, so differences are the subset's march + gate cost.

Usage: python tools/profile_geoms.py [--iters 6] [--subsets all,...]
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
    p.add_argument("--iters", type=int, default=6)
    p.add_argument("--subsets", type=str,
                   default="none,analytic,metaballs,sdf6,pyramid,all")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpuraytracer_tpu.accel import traverse
    from gpuraytracer_tpu.accel.instances import ray_to_blas
    from gpuraytracer_tpu.core import camera as cam
    from gpuraytracer_tpu.core.types import (
        IntersectorKind, RAY_TMAX, SignedDistancePrimitive,
    )
    from gpuraytracer_tpu.kernels import scene_kernel
    from gpuraytracer_tpu.models import builtin

    W, H = args.width, args.height
    scene = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    layout, arrays = scene.layout, scene.arrays
    all_geoms = tuple(
        (int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types)
    )

    def subset(name):
        def keep(i, kp):
            k, pcode = kp
            if name == "all":
                return True
            if name == "none":
                return False
            if name == "analytic":
                return k == int(IntersectorKind.ANALYTIC)
            if name == "metaballs":
                return k == int(IntersectorKind.VOLUMETRIC)
            if name == "sdf6":
                return (k == int(IntersectorKind.SIGNED_DISTANCE)
                        and pcode != int(SignedDistancePrimitive.FRACTAL_PYRAMID))
            if name == "pyramid":
                return (k == int(IntersectorKind.SIGNED_DISTANCE)
                        and pcode == int(SignedDistancePrimitive.FRACTAL_PYRAMID))
            raise ValueError(name)
        return tuple(i for i, kp in enumerate(all_geoms) if keep(i, kp))

    def timed(fn, iters):
        for _ in range(2):
            float(fn(arrays))
        t0 = time.perf_counter()
        outs = [fn(arrays) for _ in range(iters)]
        for o in outs:
            float(o)
        return (time.perf_counter() - t0) / iters * 1e3

    results = {"width": W, "height": H}
    for name in args.subsets.split(","):
        idx = subset(name)
        geoms = tuple(all_geoms[i] for i in idx)

        @jax.jit
        def run(arrays_in, idx=idx, geoms=geoms):
            px, py = cam.pixel_grid(W, H)
            o, d = cam.generate_camera_rays(
                px, py, W, H,
                arrays_in.constants.camera_position,
                arrays_in.constants.projection_to_world,
            )
            hit_p, t_p = traverse.intersect_plane(
                o, d, arrays_in.plane_origin, arrays_in.plane_size,
                t_min=0.0, t_max=RAY_TMAX,
            )
            t0v = jnp.where(hit_p, t_p, RAY_TMAX)
            if not geoms:
                return jnp.sum(t0v)
            ob, db = ray_to_blas(o, d, arrays_in.blas_offset)
            b2l, l2b, ss, aabbs, mb = scene_kernel.pack_params(
                arrays_in, arrays_in.constants.elapsed_time
            )
            sel = jnp.asarray(idx)
            bt, _, gid = scene_kernel.scene_closest_tiles(
                ob, db, jnp.ones((H, W), bool), t0v,
                b2l[sel], l2b[sel], ss[sel], aabbs[sel], mb,
                geoms=geoms,
            )
            return jnp.sum(jnp.where(jnp.isfinite(bt), bt, 0.0)) + jnp.sum(gid)

        ms = timed(run, args.iters)
        results[name] = round(ms, 2)
        print(f"{name:10s} {ms:8.2f} ms", flush=True)

    if "none" in results:
        base = results["none"]
        results["marginal"] = {
            k: round(v - base, 2) for k, v in results.items()
            if k not in ("width", "height", "none", "marginal")
            and isinstance(v, float)
        }
    print(json.dumps(results))


if __name__ == "__main__":
    main()
