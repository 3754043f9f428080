"""Compiled-Mosaic shard_map smoke on the real TPU (VERDICT r3 item 7).

Every other multi-chip artifact (dryrun_multichip, tests/test_sharding.py)
runs the Pallas kernels in CPU interpret mode, which RELAXES check_vma
(parallel/sharding.py:122-137). This smoke builds a 1-device TPU mesh and
runs the FUSED frame megakernel — real Mosaic compilation, strict vma —
under shard_map, then compares bit-for-bit against the unsharded fused
render. It is the one piece of evidence that the compiled kernels
themselves execute correctly inside a manual-axes context.

Usage: python tools/tpu_shard_smoke.py [--width 384 --height 216]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=384)
    p.add_argument("--height", type=int, default=216)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    tpus = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpus:
        print("tpu_shard_smoke: no TPU devices — skipped")
        return 0

    import numpy as np

    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.parallel import sharding
    from gpuraytracer_tpu.render import trace

    W, H = args.width, args.height
    scene = builtin.build_scene(aspect=W / H, elapsed_time=0.7)

    mesh = sharding.make_mesh(tpus[:1])
    sharded = sharding.make_sharded_renderer(
        scene.layout, W, H, mesh, use_fused=True, interpret=False)
    img_sharded = np.asarray(sharding.gather_image(sharded(scene.arrays)))

    img_plain = np.asarray(trace.render_frame(scene, W, H))

    diff = np.abs(img_sharded - img_plain).max()
    ok = diff == 0.0
    print(f"tpu_shard_smoke: {W}x{H} 1-device TPU mesh, fused Mosaic under "
          f"shard_map (strict vma): max|sharded - plain| = {diff}  "
          f"{'OK' if ok else 'MISMATCH'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
