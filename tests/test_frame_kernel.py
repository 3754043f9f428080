"""Fused frame megakernel (kernels/frame_kernel.py) vs the wavefront path.

The fused kernel re-implements raygen + shading in SoA form and reuses
scene_kernel._traverse_tile for hits; ray math is transcribed op-for-op so
march inputs stay bit-identical. These tests pin the fused image against
trace.render_frame's XLA wavefront output (interpret mode, CPU): hits must
agree everywhere except march-threshold silhouettes (bounded count), and
agreeing pixels must match to shading-ulp tolerance.
"""

import numpy as np
import pytest

from gpuraytracer_tpu.accel.instances import Scene
from gpuraytracer_tpu.kernels import frame_kernel
from gpuraytracer_tpu.models import builtin
from gpuraytracer_tpu.render import trace

W, H = 64, 36
T_ANIM = 0.7


@pytest.fixture(scope="module")
def scene():
    return builtin.build_scene(aspect=W / H, elapsed_time=T_ANIM)


@pytest.fixture(scope="module")
def reference(scene):
    return np.asarray(trace.render_frame(scene, W, H))


def _fused(scene, max_depth=3):
    smem_args, kw = frame_kernel.pack_frame_params(scene)
    return np.asarray(
        frame_kernel.render_frame_tiles(
            *smem_args, width=W, height=H, max_depth=max_depth,
            cull_backface=True, interpret=True, **kw,
        )
    )


def test_fused_matches_wavefront(scene, reference):
    img = _fused(scene)
    diff = np.abs(img - reference).max(axis=-1)
    # March-crossing silhouette flips are the only allowed large diffs.
    # They stem from XLA FMA/fusion grouping: even an op-for-op jnp
    # emulation of the wavefront raygen differs by 1 ulp on ~7% of
    # direction components (measured), and a 1-ulp direction shifts
    # relative-threshold crossings at grazing angles. 64x36 is nearly all
    # silhouette; the fraction shrinks ~linearly with resolution (the
    # 640x360 parity harness enforces the real >=99%-within-1e-3 bar).
    flipped = diff > 1e-3
    assert flipped.mean() < 0.02, f"{flipped.sum()} pixels flipped"
    agree = ~flipped
    assert diff[agree].max() < 1e-3
    # Most pixels are shading-ulp tight; ~10% differ at the 1e-4 level
    # because a 1-ulp ray shift legitimately moves a march hit's t by up
    # to the relative threshold 1e-4*t (the 1e-3 radiance bar is the
    # contract, the 1e-5 fraction just guards against gross drift).
    assert (diff[agree] < 1e-5).mean() > 0.75


def test_fused_depth1_matches(scene):
    ref = np.asarray(trace.render_frame(scene, W, H, max_depth=1))
    img = _fused(scene, max_depth=1)
    diff = np.abs(img - ref).max(axis=-1)
    flipped = diff > 1e-3
    assert flipped.mean() < 0.02
    assert (diff[~flipped] < 1e-5).mean() > 0.75


def test_fused_finite_and_bright(scene):
    img = _fused(scene)
    assert np.isfinite(img).all()
    assert img.mean() > 0.2  # a real image, not black
