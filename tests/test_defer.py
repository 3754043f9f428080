"""Deferred-shadow compaction (kernels/frame_kernel.render_frame_deferred).

Contract: occlusion results (and hence every march/boolean) are EXACTLY
the uncompacted kernel's — capped accept-first traversals are exact on
resolved lanes, unknown lanes re-run the full query in the dense sorted
queue — and the recomposed radiance agrees to shading-ulp (different
kernel programs compile the shading chain with different fusion grouping;
DEVNOTES "bit-exact cross-program parity is unattainable"). The bar here
is 4e-6 — four orders of magnitude inside the 1e-3 radiance budget.
"""

import numpy as np
import pytest

from gpuraytracer_tpu.kernels import frame_kernel
from gpuraytracer_tpu.models import builtin

W, H = 64, 36
T_ANIM = 0.7
ULP_BAR = 4e-6


@pytest.fixture(scope="module")
def scene():
    return builtin.build_scene(aspect=W / H, elapsed_time=T_ANIM)


@pytest.fixture(scope="module")
def packed(scene):
    return frame_kernel.pack_frame_params(scene)


@pytest.fixture(scope="module")
def full(packed):
    smem_args, kw = packed
    return np.asarray(
        frame_kernel.render_frame_tiles(
            *smem_args, width=W, height=H, max_depth=3,
            cull_backface=True, interpret=True, **kw,
        )
    )


def test_deferred_matches_to_ulp(packed, full):
    smem_args, kw = packed
    img, count = frame_kernel.render_frame_deferred(
        *smem_args, width=W, height=H, max_depth=3, cull_backface=True,
        shadow_cap=8, debug_count=True, interpret=True, **kw,
    )
    # A tiny cap forces real unknown lanes through the repair queue.
    assert int(count) > 0
    diff = np.abs(np.asarray(img) - full).max()
    assert diff < ULP_BAR, diff


def test_deferred_default_cap(packed, full):
    smem_args, kw = packed
    img = frame_kernel.render_frame_deferred(
        *smem_args, width=W, height=H, max_depth=3, cull_backface=True,
        interpret=True, **kw,
    )
    diff = np.abs(np.asarray(img) - full).max()
    assert diff < ULP_BAR, diff


def test_deferred_overflow_falls_back(packed, full):
    smem_args, kw = packed
    tile = frame_kernel.scene_kernel.TILE_ROWS * frame_kernel.scene_kernel.TILE_COLS
    img, count = frame_kernel.render_frame_deferred(
        *smem_args, width=W, height=H, max_depth=3, cull_backface=True,
        shadow_cap=1, cap_lanes=tile, debug_count=True, interpret=True,
        **kw,
    )
    diff = np.abs(np.asarray(img) - full).max()
    assert diff < ULP_BAR, diff
