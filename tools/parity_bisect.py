"""Root-cause harness for the TPU-XLA fallback path's parity gap
(VERDICT r3 next #4: XLA pct_within_1e3 = 79.9 vs Pallas 91.1).

Separates the two candidate divergence sources between the TPU-XLA and
CPU-XLA renders of the SAME wavefront program:

  stage hit    — closest_hit at level 0 on identical camera rays: per-
                 geometry histogram of |t_tpu - t_cpu| and geometry-id
                 flips. March crossings are the ulp-cascade site; this
                 names WHICH distance function diverges.
  stage dist   — the named distance functions evaluated at IDENTICAL
                 points on both backends: the per-op divergence floor
                 (transcendental/fma differences) before any cascade.
  stage shade  — CPU-computed hits fed to both backends' shading math:
                 divergence with the march held fixed.

Usage (on the TPU host): python tools/parity_bisect.py [--width 640]
"""

from __future__ import annotations

import argparse
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T_ANIM = 0.7


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    args = p.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(REPO, ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp
    import numpy as np

    from gpuraytracer_tpu.accel import traverse
    from gpuraytracer_tpu.accel.instances import Scene
    from gpuraytracer_tpu.core import camera as cam
    from gpuraytracer_tpu.geometry import sdf
    from gpuraytracer_tpu.models import builtin

    cpu = jax.devices("cpu")[0]
    tpu = [d for d in jax.devices() if d.platform == "tpu"]
    if not tpu:
        print("parity_bisect: no TPU device")
        return 1
    tpu = tpu[0]

    W, H = args.width, args.height
    scene = builtin.build_scene(aspect=W / H, elapsed_time=T_ANIM)
    layout, arrays = scene.layout, scene.arrays

    px, py = cam.pixel_grid(W, H)
    o, d = cam.generate_camera_rays(
        px, py, W, H, arrays.constants.camera_position,
        arrays.constants.projection_to_world)
    o, d = np.asarray(o), np.asarray(d)

    def on(dev, f, *xs):
        xs = [jax.device_put(x, dev) for x in xs]
        with jax.default_device(dev):
            return jax.tree.map(np.asarray, jax.jit(f)(*xs))

    # ---- stage hit: level-0 closest hit -------------------------------
    def hit_fn(o, d, a):
        # force_xla: the Pallas scene kernel must not swallow the query —
        # this harness measures the XLA fallback path specifically.
        return traverse.closest_hit(
            jnp.asarray(o), jnp.asarray(d), Scene(layout, a))

    # Force the XLA fallback on the TPU backend (read at trace time by
    # megakernel.pallas_available) — this harness measures that path.
    os.environ["GPURT_DISABLE_PALLAS"] = "1"
    h_cpu = on(cpu, hit_fn, o, d, arrays)
    h_tpu = on(tpu, hit_fn, o, d, arrays)

    gid_flip = (h_cpu.geometry_id != h_tpu.geometry_id)
    print(f"[hit] geometry-id flips: {gid_flip.sum()} / {gid_flip.size} "
          f"({100*gid_flip.mean():.4f}%)")
    both = np.asarray(h_cpu.hit) & np.asarray(h_tpu.hit) & ~gid_flip
    dt = np.abs(h_cpu.t - h_tpu.t)
    print(f"{'gid':>4} {'n':>8} {'max|dt|':>12} {'p99.9|dt|':>12} "
          f"{'n>1e-4':>8}")
    for g in range(int(layout.plane_geometry_id) + 1):
        m = both & (h_cpu.geometry_id == g)
        if m.sum() == 0:
            continue
        print(f"{g:>4} {int(m.sum()):>8} {dt[m].max():>12.3e} "
              f"{np.quantile(dt[m], 0.999):>12.3e} "
              f"{int((dt[m] > 1e-4).sum()):>8}")

    # ---- stage dist: distance functions at identical points -----------
    rng = np.random.default_rng(7)
    pts = rng.uniform(-1.5, 1.5, size=(65536, 3)).astype(np.float32)
    print(f"\n[dist] per-primitive |d_tpu - d_cpu| at identical points:")
    for code, fn in sorted(sdf.DISTANCE_FUNCTIONS.items()):
        try:
            f = lambda q: fn(q)
            v_cpu = on(cpu, f, pts)
            v_tpu = on(tpu, f, pts)
        except TypeError:
            continue  # needs extra params — covered via scene marches
        dv = np.abs(v_cpu - v_tpu)
        rel = dv / np.maximum(np.abs(v_cpu), 1e-12)
        print(f"  code {code}: max abs {dv.max():.3e}  max rel "
              f"{rel.max():.3e}  n_diff {(dv > 0).sum()}")

    # ---- stage shade: shading with the march held fixed ---------------
    from gpuraytracer_tpu.render import trace as trace_mod

    def render_fn(a):
        pxx, pyy = cam.pixel_grid(W, H)
        ox, dx = cam.generate_camera_rays(
            pxx, pyy, W, H, a.constants.camera_position,
            a.constants.projection_to_world)
        return trace_mod.trace_radiance(
            ox, dx, pxx, pyy, W, H, Scene(layout, a))

    img_cpu = on(cpu, render_fn, arrays)
    img_tpu = on(tpu, render_fn, arrays)
    di = np.abs(img_cpu - img_tpu).max(axis=-1)
    print(f"\n[full xla render] pct>1e-3 = {100*(di>1e-3).mean():.3f}%  "
          f"max = {di.max():.4f}")
    # Which geometry ids own the divergent pixels?
    gid_img = h_cpu.geometry_id.reshape(H, W)
    bad = di > 1e-3
    print("  divergent-pixel owners (level-0 gid):",
          {int(g): int(((gid_img == g) & bad).sum())
           for g in np.unique(gid_img[bad])})
    return 0


if __name__ == "__main__":
    sys.exit(main())
