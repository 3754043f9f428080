"""Frame-time sensitivity to the SDF step budget (crawl-lane hypothesis).

If a few pause/invalid "crawl" lanes (step ~ 1e-4*t after a culled
crossing) burn the full 512-step budget and hold their tiles hostage,
frame time should drop steeply as the budget shrinks. Parity is NOT
preserved at low budgets — this is a diagnostic, not a product setting.
"""

from __future__ import annotations

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
    import functools

    import jax
    import jax.numpy as jnp

    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.kernels import scene_kernel
    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.render import trace

    W, H = 1920, 1080
    scene0 = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    layout = scene0.layout
    arrays = scene0.arrays
    results = {}

    orig = scene_kernel.scene_closest_tiles

    for budget in (512, 128, 48, 16):
        def patched(*a, step_budgets=None, **kw):
            g = len(kw["geoms"])
            return orig(*a, step_budgets=(budget,) * g, **kw)

        scene_kernel.scene_closest_tiles = patched
        try:
            @jax.jit
            def f(arrays):
                img = trace.render_frame(Scene(layout, arrays), W, H)
                return jnp.sum(img)

            ms = timed(f, (arrays,))
        finally:
            scene_kernel.scene_closest_tiles = orig
        results[f"budget_{budget}"] = round(ms, 2)
        print(f"budget {budget:4d}: {ms:8.2f} ms", flush=True)

    print(json.dumps(results))


if __name__ == "__main__":
    main()
