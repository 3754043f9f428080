"""Device-slope profiling for the extension-fractal config (VERDICT
round-2 item 6): over-relaxation omega sweep x march-budget sweep.

The relaxed march (sdf.extension_relax, Keinert 2014) reaches a given
depth in ~omega-fold fewer steps, so the extension step budget can drop
proportionally at the same image-quality criterion that originally chose
192 (98.8% of pixels within 1e-3 of the 512-step render; with relax 1.6,
budget 128 leaves 99.46% within 1e-3 of the relaxed 192 render — see
DEVNOTES round-3 session 2).

Usage: python tools/profile_fractal.py [--relax 1.6] [--budget 192]
       [--n 4] [--scale 1.0]
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
    p.add_argument("--relax", type=float, default=None,
                   help="override GPURT_RELAX (omega; 1.0 = plain)")
    p.add_argument("--budget", type=int, default=None,
                   help="override the extension instances' step budget")
    p.add_argument("--n", type=int, default=4)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--tile-rows", type=int, default=0)
    p.add_argument("--tile-cols", type=int, default=0)
    args = p.parse_args()

    if args.relax is not None:
        os.environ["GPURT_RELAX"] = str(args.relax)
    if args.tile_rows or args.tile_cols:
        from gpuraytracer_tpu.kernels import megakernel, scene_kernel

        scene_kernel.TILE_AUTO = False
        if args.tile_rows:
            scene_kernel.TILE_ROWS = megakernel.TILE_ROWS = args.tile_rows
        if args.tile_cols:
            scene_kernel.TILE_COLS = megakernel.TILE_COLS = args.tile_cols

    import jax

    cache = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", os.path.abspath(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.models.scenes import get_config
    from gpuraytracer_tpu.render import trace

    cfg = get_config("fractal_mandelbulb_julia_1080p")
    W = max(8, int(cfg.width * args.scale))
    H = max(8, int(cfg.height * args.scale))
    builder = cfg.builder()
    scene0 = builder.build(W / H, 0.0)
    layout = scene0.layout
    if args.budget is not None:
        budgets = tuple(
            min(args.budget, b) if b < 512 else b
            for b in layout.step_budgets
        )
        layout = dataclasses.replace(layout, step_budgets=budgets)
        print(f"budgets: {budgets}")
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
                                         max_depth=cfg.max_depth)
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
    print(f"relax={os.environ.get('GPURT_RELAX', 'default')} "
          f"budget={args.budget or 'default'} {W}x{H} "
          f"wall1={t1:.1f}ms wall{args.n}={tn:.1f}ms "
          f"device_slope={slope:.2f}ms mrays_dispatch={mrays:.1f}")


if __name__ == "__main__":
    main()
