"""Cross-backend radiance parity harness (VERDICT round-1 item 4).

Renders the builtin scene at a real resolution on the current backend
(TPU: both the Pallas scene-kernel path and the pure-XLA path) and
compares against the CPU-backend reference render (the WARP analog and
golden pinning target) pixel by pixel.

Metrics per path:
  pct_within_1e3      fraction of pixels with max-RGBA |diff| <= 1e-3
  mean_abs            mean |diff|
  interior_pct_1e3    same fraction over NON-silhouette pixels (3x3
                      neighborhood range of the CPU image < 0.05) — march
                      threshold crossings at silhouettes flip by last-ulp
                      fma differences; interior pixels must be tight.
  edge_fraction       how much of the image the silhouette mask covers
  sens_fraction       measured per-pixel chaos mask: pixels whose CPU
                      render moves > 1e-3 under a 1e-6 camera perturbation
                      (see sensitivity_mask) — the honest write-off set
  stable_pct_1e3      fraction of NON-chaotic pixels within the budget —
                      the primary cross-backend accuracy bar

Writes PARITY_r{N}.json at the repo root. The CPU reference is computed
in a subprocess (the in-process backend is already initialized).

Usage: python tools/parity.py [--width 640 --height 360] [--out PARITY.json]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

T_ANIM = 0.7


def _render_cpu_subprocess(width, height, path, cam_eps=0.0):
    code = f"""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {os.path.join(REPO, ".jax_cache")!r})
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import dataclasses
import numpy as np
from gpuraytracer_tpu.models import builtin
from gpuraytracer_tpu.render import trace
scene = builtin.build_scene(aspect={width}/{height}, elapsed_time={T_ANIM})
arrays = scene.arrays
if {cam_eps!r}:
    cp = np.asarray(arrays.constants.camera_position)
    eps = np.zeros_like(cp)
    e = np.atleast_1d(np.asarray({cam_eps!r}, dtype=cp.dtype))
    if e.size > 1:
        eps[:3] += e
    else:
        eps += e[0]
    c = dataclasses.replace(
        arrays.constants,
        camera_position=arrays.constants.camera_position + eps,
    )
    arrays = dataclasses.replace(arrays, constants=c)
img = np.asarray(trace.render_frame(
    type(scene)(scene.layout, arrays), {width}, {height}))
np.save({path!r}, img)
print("cpu reference done")
"""
    subprocess.run([sys.executable, "-c", code], cwd=REPO, check=True)


def silhouette_mask(ref, thresh=0.05):
    """True where the 3x3 neighborhood of the CPU image varies strongly —
    geometry/shading edges where threshold-crossing flips live."""
    import numpy as np

    lum = ref[..., :3].max(axis=-1)
    h, w = lum.shape
    lo = lum.copy()
    hi = lum.copy()
    for dy in (-1, 0, 1):
        for dx in (-1, 0, 1):
            shifted = np.roll(np.roll(lum, dy, axis=0), dx, axis=1)
            lo = np.minimum(lo, shifted)
            hi = np.maximum(hi, shifted)
    return (hi - lo) > thresh


def sensitivity_mask(ref, ref_eps, thresh=1e-3):
    """True where the CPU render itself moves more than `thresh` under an
    ulp-scale camera perturbation (1e-6 on a ~10-unit eye position).

    This replaces the blanket geometric silhouette write-off with a
    MEASURED per-pixel chaos criterion: a pixel whose radiance flips under
    a last-ulp input change (march-threshold crossings, crawl-lane shadow
    booleans) cannot be expected to agree across backends whose fma/libm
    rounding differs by exactly that much; every other pixel has no such
    excuse and must meet the budget."""
    import numpy as np

    return np.abs(ref_eps - ref).max(axis=-1) > thresh


def compare(img, ref, sens=None):
    import numpy as np

    diff = np.abs(img - ref).max(axis=-1)
    edge = silhouette_mask(ref)
    interior = ~edge
    out = {
        "pct_within_1e3": round(float((diff <= 1e-3).mean()) * 100, 3),
        "mean_abs": float(f"{diff.mean():.3e}"),
        "p99_abs": float(f"{np.quantile(diff, 0.99):.3e}"),
        "interior_pct_1e3": round(
            float((diff[interior] <= 1e-3).mean()) * 100, 3
        ),
        "interior_max_abs": float(f"{diff[interior].max():.3e}"),
        "edge_fraction": round(float(edge.mean()) * 100, 2),
    }
    if sens is not None:
        stable = ~sens
        out["sens_fraction"] = round(float(sens.mean()) * 100, 2)
        out["stable_pct_1e3"] = round(
            float((diff[stable] <= 1e-3).mean()) * 100, 3
        )
        out["stable_p999_abs"] = float(
            f"{np.quantile(diff[stable], 0.999):.3e}"
        )
        out["stable_max_abs"] = float(f"{diff[stable].max():.3e}")
    return out


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=640)
    p.add_argument("--height", type=int, default=360)
    p.add_argument("--out", type=str, default=os.path.join(REPO, "PARITY.json"))
    args = p.parse_args()
    W, H = args.width, args.height

    import numpy as np

    ref_path = os.path.join(REPO, "out", f"parity_cpu_{W}x{H}.npy")
    os.makedirs(os.path.dirname(ref_path), exist_ok=True)
    if not os.path.exists(ref_path):
        print(f"rendering CPU reference {W}x{H} ...", flush=True)
        _render_cpu_subprocess(W, H, ref_path)
    ref = np.load(ref_path)
    # MULTI-directional chaos probe (VERDICT r3 next #4: the single
    # +eps probe under-detects — a pixel can be stable along one
    # direction yet knife-edge along another). The mask is the UNION of
    # hypersensitive sets over three ulp-scale camera perturbations;
    # each probe is one extra cached CPU render.
    probes = [1e-6, -1e-6, (1e-6, -1e-6, 1e-6)]
    sens = None
    for i, eps in enumerate(probes):
        eps_path = os.path.join(REPO, "out",
                                f"parity_cpu_eps{i}_{W}x{H}.npy")
        if not os.path.exists(eps_path):
            print(f"rendering perturbed CPU reference {i} {W}x{H} ...",
                  flush=True)
            _render_cpu_subprocess(W, H, eps_path, cam_eps=eps)
        m = sensitivity_mask(ref, np.load(eps_path))
        sens = m if sens is None else (sens | m)

    import jax

    from gpuraytracer_tpu.kernels import megakernel
    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.render import trace

    backend = jax.default_backend()
    scene = builtin.build_scene(aspect=W / H, elapsed_time=T_ANIM)

    results = {"width": W, "height": H, "t": T_ANIM, "backend": backend}

    # Path 1: default (Pallas scene kernel on TPU).
    img = np.asarray(jax.jit(
        lambda a: trace.render_frame(
            type(scene)(scene.layout, a), W, H
        )
    )(scene.arrays))
    results["pallas" if backend == "tpu" else backend] = compare(img, ref, sens)

    if backend == "tpu":
        # Path 2: pure-XLA wavefront (megakernel disabled).
        os.environ["GPURT_DISABLE_PALLAS"] = "1"
        try:
            img2 = np.asarray(jax.jit(
                lambda a: trace.render_frame(
                    type(scene)(scene.layout, a), W, H
                )
            )(scene.arrays))
            results["xla"] = compare(img2, ref, sens)
        finally:
            del os.environ["GPURT_DISABLE_PALLAS"]

    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
