"""Benchmark suite over the five BASELINE.json configs.

Records both Mrays/s variants the reference computes: fps-derived
(Renderer.cpp:391) and dispatch-time-derived
(RendererRaytracingHelper.h:673-678), per config.

Usage:
  python -m gpuraytracer_tpu.apps.bench_suite [--configs a,b] [--frames 4]
         [--scale 1.0] [--json out.json]
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def bench_config(cfg, frames: int = 4, warmup: int = 1, scale: float = 1.0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.render import trace
    from gpuraytracer_tpu.utils import stats

    width = max(8, int(cfg.width * scale))
    height = max(8, int(cfg.height * scale))
    builder = cfg.builder()
    scene0 = builder.build(width / height, 0.0)
    layout = scene0.layout
    animate = builder.animator()

    @jax.jit
    def step(arrays, t_anim):
        # Per-frame animation runs in the same program as the trace (eager
        # host-side scene rebuilding costs ~ms per op on remote plugins).
        arrays = animate(arrays, t_anim)
        img = trace.render_frame(Scene(layout, arrays), width, height,
                                 max_depth=cfg.max_depth)
        # Checksum forces full materialization without a framebuffer
        # transfer (block_until_ready alone does not synchronize on remote
        # plugins).
        return img, jnp.sum(img)

    arrays0 = scene0.arrays
    t0 = time.perf_counter()
    _, checksum = step(arrays0, 0.0)
    float(checksum)
    t_compile = time.perf_counter() - t0
    for i in range(1, warmup):
        _, c = step(arrays0, 0.033 * i if cfg.animated else 0.0)
        float(c)

    # Frames-in-flight throughput (see bench.py for the rationale).
    t0 = time.perf_counter()
    checks = [
        step(arrays0, 0.033 * i if cfg.animated else 0.0)[1]
        for i in range(frames)
    ]
    for c in checks:
        float(c)
    times = [(time.perf_counter() - t0) / frames]

    import numpy as np

    frame_ms = float(np.median(times) * 1e3)
    fps = 1e3 / frame_ms
    return {
        "config": cfg.name,
        "width": width,
        "height": height,
        "max_depth": cfg.max_depth,
        "frame_ms": round(frame_ms, 3),
        "fps": round(fps, 3),
        "mrays_fps": round(stats.mrays_per_second_from_fps(width, height, fps), 3),
        "mrays_dispatch": round(
            stats.mrays_per_second_from_dispatch_ms(width, height, frame_ms), 3
        ),
        "compile_s": round(t_compile, 1),
    }


def main(argv=None) -> int:
    from gpuraytracer_tpu.models.scenes import BENCH_CONFIGS, get_config

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--configs", type=str, default="",
                   help="comma-separated names (default: all five)")
    p.add_argument("--frames", type=int, default=4)
    p.add_argument("--warmup", type=int, default=1)
    p.add_argument("--scale", type=float, default=1.0,
                   help="resolution scale factor (CI smoke runs)")
    p.add_argument("--json", type=str, default="")
    args = p.parse_args(argv)

    configs = (
        [get_config(n) for n in args.configs.split(",") if n]
        if args.configs
        else list(BENCH_CONFIGS)
    )
    results = []
    for cfg in configs:
        r = bench_config(cfg, args.frames, args.warmup, args.scale)
        print(json.dumps(r), flush=True)
        results.append(r)
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)
    return 0


if __name__ == "__main__":
    sys.exit(main())
