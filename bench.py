"""Benchmark harness — the calculate_frame_stats / GPUTimer analog.

Headline metric (BASELINE.md): "~Million Primary Rays/s" = W*H*fps / 1e6
(reference: Renderer.cpp:374-399) on the 1080p builtin scene (the SDF
fractal is the dominant cost — BASELINE.json configs #3/#5 class). The
north-star target is 100 Mrays/s/chip on TPU v5e.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
vs_baseline is value / 100 (the north-star Mrays/s target; the reference
publishes no numbers of its own — BASELINE.md).
"""

from __future__ import annotations

import json
import sys
import time


NORTH_STAR_MRAYS = 100.0


def _setup_cache():
    """Persistent compile cache: the two-phase scene kernels take minutes
    of Mosaic compile at a fresh shape; cache hits make reruns instant."""
    import os

    import jax

    cache = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def run_bench(width: int = 1920, height: int = 1080, frames: int = 64, warmup: int = 2,
              chain: int = 64):
    import jax
    import numpy as np

    _setup_cache()

    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.render import trace

    import jax.numpy as jnp

    from gpuraytracer_tpu.accel.instances import Scene

    scene0 = builtin.build_scene(aspect=width / height, elapsed_time=0.0)
    layout = scene0.layout

    @jax.jit
    def render(arrays, t_start):
        # A burst of `chain` animated frames per dispatch, like the
        # reference's default run (geometry animation on): each frame's
        # transform rebuild (the on_update work) runs inside the same
        # program as its trace, at its own elapsed_time, via lax.scan —
        # ONE compile of the frame program regardless of chain length.
        # Chaining frames per dispatch keeps the device saturated on this
        # dev setup's remote tunnel, whose ~25 ms per-dispatch host floor
        # otherwise dominates (raygen alone "costs" 26 ms wall; the scene
        # kernel's marginal cost is 0.5 ms — see DEVNOTES). The
        # reference's triple-buffered fence pacing amortizes Present
        # latency the same way: the GPU renders queued frames back to
        # back, and its fps window is a full second (Renderer.cpp:374-399)
        # — at ~35 fps that is ~35 frames per measurement, the scale this
        # chain matches.
        def frame(carry, t):
            acc, _ = carry
            arrays_i = builtin.animate_arrays(arrays, t)
            img = trace.render_frame(Scene(layout, arrays_i), width, height)
            # The frame rides the scan carry: every iteration MATERIALIZES
            # its full framebuffer into the carried HBM buffer — the
            # reference's per-frame UAV write + backbuffer copy analog
            # (Renderer.cpp:454-476); XLA cannot reduce the image away
            # into the checksum. The scalar checksum still forces device
            # completion before the host timestamp (block_until_ready
            # alone does not synchronize on remote-plugin backends) while
            # transferring only 4 bytes — the GPU-timer bracket analog.
            return (acc + jnp.sum(img), img), None

        ts = t_start + 0.0333 * jnp.arange(chain, dtype=jnp.float32)
        fb0 = jnp.zeros((height, width, 4), dtype=jnp.float32)
        (acc, _last), _ = jax.lax.scan(frame, (jnp.float32(0.0), fb0), ts)
        return acc

    arrays0 = scene0.arrays
    for i in range(warmup):
        float(render(arrays0, 0.0333 * chain * i))

    # Steady-state throughput with windows in flight — the reference's own
    # fps semantics (triple-buffered swapchain, fps averaged over a 1 s
    # window: Renderer.cpp:374-399 + fence pacing): windows dispatch
    # asynchronously and the wall clock covers all rendered frames.
    windows = max(1, frames // chain)
    t0 = time.perf_counter()
    checksums = [render(arrays0, 0.0333 * chain * i) for i in range(windows)]
    for c in checksums:
        float(c)
    wall = time.perf_counter() - t0

    frame_ms = wall / (windows * chain) * 1e3
    fps = 1e3 / frame_ms
    mrays = width * height * fps / 1e6
    return {
        "metric": "primary_mrays_per_sec_per_chip_1080p_builtin_scene",
        "value": round(mrays, 3),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / NORTH_STAR_MRAYS, 4),
        "detail": {
            "frame_ms": round(frame_ms, 2),
            "fps": round(fps, 3),
            "width": width,
            "height": height,
            "frames": windows * chain,
            "chain": chain,
            "backend": jax.default_backend(),
            "device": str(jax.devices()[0]),
        },
    }


def main():
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=1920)
    p.add_argument("--height", type=int, default=1080)
    p.add_argument("--frames", type=int, default=64)
    p.add_argument("--warmup", type=int, default=2)
    p.add_argument("--chain", type=int, default=64,
                   help="animated frames per dispatch window, scanned in"
                        " one program (amortizes this dev setup's ~25 ms"
                        " per-dispatch tunnel floor the way the"
                        " reference's triple-buffered fence pacing"
                        " amortizes Present latency; the reference's own"
                        " fps window is ~a second of frames)")
    args = p.parse_args()
    result = run_bench(args.width, args.height, args.frames, args.warmup,
                       args.chain)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
