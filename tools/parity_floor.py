"""Parity noise-floor control experiment (VERDICT round-2 item 4).

Question: when the SAME semantics are compiled in two different fusion
contexts on the SAME backend, what fraction of pixels stays within the
1e-3 radiance budget? That number — not 100% — is the honest ceiling for
any cross-program parity bar, because XLA's FMA/fusion grouping depends
on the surrounding program and a 1-ulp ray-direction difference flips
relative-threshold march crossings (DEVNOTES).

Three compilations of the builtin render, same backend:
  A: jit(render)                        — the plain program
  B: jit(render + unrelated consumer)   — same render, different fusion
                                          context (a sum over the image
                                          changes elementwise grouping)
  C: jit(chain of 2 renders)[0]         — the render embedded in a larger
                                          program (bench.py's shape)

Reports pairwise compare() metrics (same methodology as tools/parity.py).
Run on CPU (default) or TPU; writes PARITY_FLOOR.json.

Usage: python tools/parity_floor.py [--width 640 --height 360] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T_ANIM = 0.7


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--out", type=str,
                   default=os.path.join(REPO, "PARITY_FLOOR.json"))
    args = p.parse_args()
    W, H = args.width, args.height

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(REPO, ".jax_cache")
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.render import trace
    from tools.parity import compare

    scene = builtin.build_scene(aspect=W / H, elapsed_time=T_ANIM)
    layout = scene.layout

    def render(a):
        return trace.render_frame(Scene(layout, a), W, H)

    @jax.jit
    def prog_a(a):
        return render(a)

    @jax.jit
    def prog_b(a):
        img = render(a)
        # The consumer changes XLA's fusion grouping for the producer ops;
        # mathematically img is untouched.
        return img, jnp.sum(img * 2.0)

    @jax.jit
    def prog_c(a):
        img1 = render(a)
        a2 = builtin.animate_arrays(a, T_ANIM + 0.033)
        img2 = render(a2)
        return img1, jnp.sum(img2)

    print(f"compiling 3 variants at {W}x{H} on {jax.default_backend()} ...",
          flush=True)
    ia = np.asarray(prog_a(scene.arrays))
    ib = np.asarray(prog_b(scene.arrays)[0])
    ic = np.asarray(prog_c(scene.arrays)[0])

    results = {
        "width": W, "height": H, "t": T_ANIM,
        "backend": jax.default_backend(),
        "experiment": "same semantics, three fusion contexts (A/B/C)",
        "a_vs_b": compare(ib, ia),
        "a_vs_c": compare(ic, ia),
        "b_vs_c": compare(ic, ib),
    }
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
