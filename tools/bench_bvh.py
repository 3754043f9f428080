"""Clustered-traversal (accel/bvh.py) crossover benchmark.

VERDICT round-1 item 7 asks for the bench row proving the two-level
bounds hierarchy wins past the flat threshold: an N-instance analytic
scene traversed with and without clustering on the real TPU. Clusters
gate whole groups behind one merged-AABB slab test per tile, so tiles
that miss a cluster skip all member geometry.

Usage: python tools/bench_bvh.py [--n 112] [--iters 6]
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
    p.add_argument("--n", type=int, default=112)
    p.add_argument("--width", type=int, default=1280)
    p.add_argument("--height", type=int, default=720)
    p.add_argument("--iters", type=int, default=6)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpuraytracer_tpu.accel.instances import ray_to_blas
    from gpuraytracer_tpu.core import camera as cam
    from gpuraytracer_tpu.core.types import RAY_TMAX
    from gpuraytracer_tpu.kernels import scene_kernel
    from tests.test_bvh import _stress_builder

    W, H = args.width, args.height
    b = _stress_builder(args.n)
    scene = b.build(W / H, 0.0)
    layout, arrays = scene.layout, scene.arrays
    assert layout.clusters is not None and len(layout.clusters) > 1
    geoms = tuple(
        (int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types)
    )
    params = scene_kernel.pack_params(arrays, arrays.constants.elapsed_time)

    def make(clusters, n_chain):
        @jax.jit
        def run(arrays_in):
            px, py = cam.pixel_grid(W, H)
            o, d = cam.generate_camera_rays(
                px, py, W, H,
                arrays_in.constants.camera_position,
                arrays_in.constants.projection_to_world,
            )
            ob, db = ray_to_blas(o, d, arrays_in.blas_offset)
            active = jnp.ones((H, W), bool)
            acc = jnp.float32(0.0)
            t0 = jnp.full((H, W), RAY_TMAX, jnp.float32)
            for i in range(n_chain):
                bt, nrm, gid = scene_kernel.scene_closest_tiles(
                    ob, db, active, t0, *params, geoms=geoms,
                    clusters=clusters,
                )
                acc = acc + jnp.sum(jnp.where(jnp.isfinite(bt), bt, 0.0)) + jnp.sum(gid)
                # Data dependency so XLA cannot CSE the chained passes:
                # bounce off the hits.
                hitp = ob + bt[..., None] * db
                ob = jnp.where(jnp.isfinite(bt)[..., None], hitp, ob)
                db = jnp.where(
                    jnp.isfinite(bt)[..., None],
                    db - 2.0 * jnp.sum(db * nrm, -1, keepdims=True) * nrm, db,
                )
            return acc

        return run

    def timed(fn):
        for _ in range(2):
            float(fn(arrays))
        t0 = time.perf_counter()
        vals = [fn(arrays) for _ in range(args.iters)]
        for v in vals:
            float(v)
        return (time.perf_counter() - t0) / args.iters * 1e3

    # The remote tunnel has a ~25 ms per-dispatch host floor; the pass
    # cost is the SLOPE between 1-pass and N-pass chained programs
    # (DEVNOTES slope methodology).
    N = 4
    results = {"n_instances": args.n, "width": W, "height": H,
               "n_clusters": len(layout.clusters)}
    outs = {}
    for name, clusters in (("flat", None), ("clustered", layout.clusters)):
        outs[name] = float(make(clusters, 1)(arrays))
        t1 = timed(make(clusters, 1))
        tn = timed(make(clusters, N))
        ms = (tn - t1) / (N - 1)
        results[f"{name}_ms"] = round(ms, 2)
        print(f"{name:10s} {ms:8.2f} ms/pass (device slope)", flush=True)

    assert outs["flat"] == outs["clustered"], "clustered != flat checksum"
    results["speedup"] = round(results["flat_ms"] / results["clustered_ms"], 3)
    results["checksum_equal"] = True
    print(json.dumps(results))


if __name__ == "__main__":
    main()
