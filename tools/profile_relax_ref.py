"""Accuracy A/B for the over-relaxed march knobs (GPURT_RELAX_REF /
GPURT_RELAX_SHADOW).

Renders the builtin scene on the CURRENT backend at two relax settings in
separate subprocesses (the knob is read at trace time) and reports how
many pixels move > 1e-3 — the same acceptance methodology that chose the
extension-fractal march budget (DEVNOTES round-3). Run on CPU for a
device-free accuracy read; the perf side is tools/profile_fused.py on
the TPU.

Usage: python tools/profile_relax_ref.py [--width 320] [--height 180]
       [--omega 1.6] [--t 0.7] [--env GPURT_RELAX_REF]
       (--env GPURT_RELAX_SHADOW A/Bs the occlusion-march relaxation)
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RENDER_SNIPPET = r"""
import os, sys
sys.path.insert(0, {repo!r})
import numpy as np
import jax
# The env var alone LOSES to this host's sitecustomize (it force-registers
# the TPU plugin and overrides JAX_PLATFORMS) — re-assert the requested
# platform through jax.config or "--platform cpu" silently runs on TPU.
jax.config.update("jax_platforms", os.environ.get("JAX_PLATFORMS", "cpu"))
jax.config.update("jax_compilation_cache_dir", os.path.join({repo!r}, ".jax_cache"))
from gpuraytracer_tpu.render import trace
from gpuraytracer_tpu.accel.instances import Scene

w, h, t = {w}, {h}, {t}
if {config!r}:
    from gpuraytracer_tpu.models.scenes import get_config
    cfg = get_config({config!r})
    builder = cfg.builder()
    scene0 = builder.build(w / h, 0.0)
    arrays = builder.animator()(scene0.arrays, t)
    img = np.asarray(trace.render_frame(
        Scene(scene0.layout, arrays), w, h, max_depth=cfg.max_depth))
else:
    from gpuraytracer_tpu.models import builtin
    scene = builtin.build_scene(aspect=w / h, elapsed_time=t)
    img = np.asarray(trace.render_frame(scene, w, h))
np.save({out!r}, img)
"""


EXACT_ENV = {
    # Every accuracy knob at its exact-reference-semantics setting.
    "GPURT_RELAX_SHADOW": "1.0",
    "GPURT_SHADOW_BUDGET": "0",
    "GPURT_MARCH_BUDGET": "0",
    "GPURT_RELAX_REF": "1.0",
    "GPURT_SHADOW_BUDGET_B": "0",
    "GPURT_MARCH_BUDGET_B": "0",
}


def render(w, h, t, omega, out, platform, env_key, config=""):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = platform
    if env_key == "COMBINED":
        # A (omega==1.0): exact reference semantics; B: shipped defaults.
        if omega == 1.0:
            env.update(EXACT_ENV)
        else:
            for k in EXACT_ENV:
                env.pop(k, None)
    else:
        env[env_key] = str(omega)
    code = RENDER_SNIPPET.format(repo=REPO, w=w, h=h, t=t, out=out,
                                 config=config)
    subprocess.run([sys.executable, "-c", code], check=True, env=env,
                   timeout=3600)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--width", type=int, default=320)
    p.add_argument("--height", type=int, default=180)
    p.add_argument("--omega", type=float, default=1.6)
    p.add_argument("--t", type=float, default=0.7)
    p.add_argument("--platform", type=str, default="cpu")
    p.add_argument("--env", type=str, default="GPURT_RELAX_REF",
                   help="relax knob to A/B (GPURT_RELAX_REF /"
                        " GPURT_RELAX_SHADOW / GPURT_SHADOW_BUDGET /"
                        " GPURT_MARCH_BUDGET), or COMBINED to compare"
                        " exact reference semantics (all knobs off)"
                        " against the shipped defaults")
    p.add_argument("--config", type=str, default="",
                   help="bench-suite config name instead of the builtin"
                        " scene (e.g. sdf_primitives_720p)")
    args = p.parse_args()

    import numpy as np

    with tempfile.TemporaryDirectory() as td:
        a_path = os.path.join(td, "plain.npy")
        b_path = os.path.join(td, "relaxed.npy")
        render(args.width, args.height, args.t, 1.0, a_path, args.platform,
               args.env, args.config)
        render(args.width, args.height, args.t, args.omega, b_path,
               args.platform, args.env, args.config)
        a = np.load(a_path)
        b = np.load(b_path)

    d = np.abs(a - b).max(axis=-1)
    report = {
        "width": args.width,
        "height": args.height,
        "env": args.env,
        "config": args.config or "builtin",
        "omega": args.omega,
        "pct_within_1e3": round(float((d <= 1e-3).mean() * 100), 3),
        "pct_moved_1e3": round(float((d > 1e-3).mean() * 100), 3),
        "mean_abs": round(float(d.mean()), 6),
        "p99_abs": round(float(np.percentile(d, 99)), 5),
        "max_abs": round(float(d.max()), 4),
    }
    print(json.dumps(report))


if __name__ == "__main__":
    main()
