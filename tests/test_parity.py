"""Cross-backend radiance parity bars (VERDICT round-1 item 4).

tools/parity.py renders the builtin scene on the TPU (fused Pallas path +
pure-XLA path) against the CPU-backend reference at 640x360 and writes
PARITY_r{N}.json. These tests enforce the bars on that artifact so a
parity regression fails CI the moment the artifact is refreshed, plus a
TPU-marked live re-run for TPU-attached hosts.

Measured context (round-3 control experiment, PARITY_FLOOR.json /
PARITY_FLOOR_TPU.json): the same render compiled in three different
fusion contexts is BIT-IDENTICAL on both the CPU and the TPU backend —
same-backend compilation noise is exactly zero. The 1e-3 exceedances are
therefore pure cross-BACKEND float semantics (TPU fma contraction /
transcendental rounding vs the CPU stand-in for the reference), which
flip relative-threshold march crossings at silhouettes and crawl-lane
shadow booleans. The bars pin that cross-backend envelope: the fused
path must keep >=89% of all pixels and >=95% of non-silhouette pixels
within the 1e-3 radiance budget.

Round-3 adds a MEASURED chaos criterion (tools/parity.py
sensitivity_mask): pixels whose CPU render moves > 1e-3 under a 1e-6
camera perturbation (14.78% of the image at 640x360 — less than half
the old 37.75% geometric silhouette write-off) are demonstrably
hypersensitive to last-ulp input changes and cannot be expected to agree
across backends whose rounding differs by exactly that much. Over the
remaining 85%, the fused path measures 96.97% within 1e-3
(PARITY_r03.json stable_pct_1e3); the bar pins that with margin. The
mask is a single-direction probe, so it under-detects chaos (a pixel
can be stable along the probed direction yet chaotic along others) —
residual stable-pixel outliers (stable_max_abs 1.6) are knife-edge
crossings the probe missed, which is why the bar is a percentage, not a
max.
"""

import glob
import json
import os
import subprocess
import sys

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PCT_BAR = 89.0
INTERIOR_BAR = 95.5

# Round 5 closed the pure-XLA TPU path's gap: its ray transforms were
# dot_generals riding the MXU at default bfloat16 precision, perturbing
# every local-space ray ~1e-3 relative before its march (see
# accel/instances.ray_to_local and tools/parity_bisect.py). With
# explicit f32 row math the XLA path measures 91.1%/97.2%/96.9%
# (PARITY_r05.json) — at the Pallas path's level — and the bars ratchet
# from the old 78/90/86 fence to achieved-minus-margin.
XLA_PCT_BAR = 89.0
XLA_INTERIOR_BAR = 95.5

# Accuracy over measured-NON-chaotic pixels (see module docstring);
# achieved 96.97 / 96.94 in PARITY_r05.json.
STABLE_BAR = 95.5
XLA_STABLE_BAR = 95.5


def _latest_parity_artifact():
    paths = sorted(glob.glob(os.path.join(REPO, "PARITY*.json")))
    return paths[-1] if paths else None


def test_parity_artifact_meets_bars():
    path = _latest_parity_artifact()
    if path is None:
        pytest.skip("no PARITY*.json artifact present")
    with open(path) as f:
        results = json.load(f)
    if "pallas" not in results:
        pytest.skip("artifact was generated on a non-TPU backend")
    p = results["pallas"]
    assert p["pct_within_1e3"] >= PCT_BAR, p
    assert p["interior_pct_1e3"] >= INTERIOR_BAR, p
    if "stable_pct_1e3" in p:
        assert p["stable_pct_1e3"] >= STABLE_BAR, p
    # The artifact must cover a real resolution, not a thumbnail.
    assert results["width"] * results["height"] >= 320 * 180
    if "xla" in results:
        x = results["xla"]
        assert x["pct_within_1e3"] >= XLA_PCT_BAR, x
        assert x["interior_pct_1e3"] >= XLA_INTERIOR_BAR, x
        if "stable_pct_1e3" in x:
            assert x["stable_pct_1e3"] >= XLA_STABLE_BAR, x


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="live parity needs the TPU backend")
def test_parity_live_tpu(tmp_path):
    out = tmp_path / "parity_live.json"
    subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "parity.py"),
         "--width", "320", "--height", "180", "--out", str(out)],
        cwd=REPO, check=True, timeout=2400,
    )
    with open(out) as f:
        results = json.load(f)
    p = results["pallas"]
    assert p["pct_within_1e3"] >= PCT_BAR - 2  # smaller res = more edge
    assert p["interior_pct_1e3"] >= INTERIOR_BAR - 2
