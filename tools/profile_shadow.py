"""Occlusion-pass cost attribution (round-3: shadows are 17 of 31 ms).

Caps the SHADOW-side march budgets only (the (closest, shadow) cap pair
render_frame_tiles already carries for the deferred mode) to attribute the
occlusion cost between SDF marches, metaball sampling, and everything
else. Capped shadow lanes silently miss (render is WRONG — diagnostic
only, never a product setting).

  --shadow-cap N      SDF occlusion marches capped at N steps (1 ~= off)
  --mb-shadow-cap N   metaball occlusion marches capped at N

Methodology: chained-frame device slope (DEVNOTES).
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
    p.add_argument("--shadow-cap", type=int, default=0)
    p.add_argument("--mb-shadow-cap", type=int, default=0)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.kernels import frame_kernel, scene_kernel
    from gpuraytracer_tpu.models import builtin

    W, H = args.width, args.height
    scene0 = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    scene_kernel.apply_tile_policy(scene0.layout)
    bcap = (None, args.shadow_cap) if args.shadow_cap else None
    mcap = (None, args.mb_shadow_cap) if args.mb_shadow_cap else None

    def make(n):
        @jax.jit
        def f(a):
            acc = jnp.float32(0.0)
            for i in range(n):
                ai = builtin.animate_arrays(a, 0.033 * (i + 1))
                smem_args, kw = frame_kernel.pack_frame_params(
                    Scene(scene0.layout, ai))
                img = frame_kernel.render_frame_tiles(
                    *smem_args, width=W, height=H, max_depth=3,
                    cull_backface=True, budget_cap=bcap, mb_budget_cap=mcap,
                    **kw)
                acc = acc + jnp.sum(img)
            return acc
        return f

    def timed(fn):
        for _ in range(2):
            float(fn(scene0.arrays))
        t0 = time.perf_counter()
        outs = [fn(scene0.arrays) for _ in range(args.iters)]
        for o in outs:
            float(o)
        return (time.perf_counter() - t0) / args.iters * 1e3

    t1 = timed(make(1))
    tn = timed(make(args.n))
    slope = (tn - t1) / (args.n - 1)
    print(json.dumps({
        "width": W, "height": H, "n": args.n,
        "shadow_cap": args.shadow_cap or "ref",
        "mb_shadow_cap": args.mb_shadow_cap or "ref",
        "t1_ms": round(t1, 2), "tN_ms": round(tn, 2),
        "frame_device_ms": round(slope, 2),
    }))


if __name__ == "__main__":
    main()
