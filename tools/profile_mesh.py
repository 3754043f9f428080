"""Device-slope bench row for a triangle-mesh scene on the Pallas path
(VERDICT round-2 item 5 done-criterion).

Scene: ground plane + a 3x3 grid of octahedron mesh instances (8 faces
each, 72 faces total < TRI_FACE_CAP per-kernel budget? No — cap is 64, so
use 2x4 = 64 faces) + one SDF object so the march path coexists. Renders
through trace.render_frame, which routes the fused/compacted kernels when
the Pallas path is available; off-TPU it measures the XLA path.

Writes out/bench_mesh.json. Usage: python tools/profile_mesh.py [--n 4]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def octahedron(radius=1.0):
    positions = [
        (0.0, radius, 0.0), (0.0, -radius, 0.0),
        (radius, 0.0, 0.0), (-radius, 0.0, 0.0),
        (0.0, 0.0, radius), (0.0, 0.0, -radius),
    ]
    indices = [
        [0, 4, 2], [0, 2, 5], [0, 5, 3], [0, 3, 4],
        [1, 2, 4], [1, 5, 2], [1, 3, 5], [1, 4, 3],
    ]
    return positions, indices


def build_mesh_scene(aspect):
    from gpuraytracer_tpu.models.builder import Material, SceneBuilder

    b = SceneBuilder()
    positions, indices = octahedron()
    # 8 instances x 8 faces = 64 faces — exactly the Pallas TRI_FACE_CAP.
    k = 0
    for gx in range(4):
        for gz in range(2):
            x = -6.0 + gx * 4.0
            z = -4.0 + gz * 6.0
            b.add_mesh_instance(
                positions, indices,
                Material((0.9, 0.2 + 0.1 * k, 0.2, 1.0), reflectance=0.3),
                aabb_min=(x - 1.2, -1.2, z - 1.2),
                aabb_max=(x + 1.2, 1.2, z + 1.2),
                scale=(1.0, 1.0, 1.0),
            )
            k += 1
    return b.build(aspect=aspect, elapsed_time=0.3)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--out", type=str, default="out/bench_mesh.json")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpuraytracer_tpu.render import trace

    W, H = args.width, args.height
    scene = build_mesh_scene(W / H)
    layout = scene.layout
    arrays = scene.arrays

    from gpuraytracer_tpu.accel.instances import Scene

    import dataclasses

    def make(n):
        @jax.jit
        def f(a):
            acc = jnp.float32(0.0)
            for i in range(n):
                # Microscopic per-frame camera perturbation so chained
                # frames cannot be CSE'd into one render by XLA (the
                # bench_suite trick; frames must be distinct programs).
                ci = dataclasses.replace(
                    a.constants,
                    camera_position=a.constants.camera_position
                    + jnp.float32(1e-6) * (i + 1),
                )
                ai = dataclasses.replace(a, constants=ci)
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
    mrays = W * H / (slope / 1e3) / 1e6 if slope > 0 else None
    out = {
        "scene": "mesh_grid_8x_octahedron_64_faces_plus_plane",
        "width": W, "height": H,
        "backend": jax.default_backend(),
        "t1_ms": round(t1, 2), "tN_ms": round(tn, 2),
        "frame_device_ms": round(slope, 2),
        "mrays_per_s_device": round(mrays, 1) if mrays else None,
    }
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
