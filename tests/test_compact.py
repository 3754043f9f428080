"""Two-round compacted frame (kernels/frame_kernel.render_frame_compact).

The compaction contract is BIT-identity with the uncompacted full-budget
kernel: round 1 caps SDF marches (strict prefix — a march that resolves
within the cap is unchanged), and every lane any of whose marches capped
is recomputed end-to-end at full budget in the dense queue pass, with
nothing reused. These tests pin that equality in interpret mode (CPU),
including the overflow fallback (queue capacity exceeded -> whole frame
re-rendered uncompacted via lax.cond).
"""

import numpy as np
import pytest

from gpuraytracer_tpu.kernels import frame_kernel
from gpuraytracer_tpu.models import builtin

W, H = 64, 36
T_ANIM = 0.7


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


def test_compact_bit_identical(packed, full):
    smem_args, kw = packed
    img, count = frame_kernel.render_frame_compact(
        *smem_args, width=W, height=H, max_depth=3, cull_backface=True,
        budget_cap=8, debug_count=True, interpret=True, **kw,
    )
    # A tiny cap forces real dirty lanes, so the dense requeue actually
    # runs (otherwise this test would pass vacuously).
    assert int(count) > 0
    np.testing.assert_array_equal(np.asarray(img), full)


def test_compact_default_cap_identical(packed, full):
    smem_args, kw = packed
    img = frame_kernel.render_frame_compact(
        *smem_args, width=W, height=H, max_depth=3, cull_backface=True,
        interpret=True, **kw,
    )
    np.testing.assert_array_equal(np.asarray(img), full)


def test_compact_uncappable_scene_short_circuits():
    """A scene with no cappable march (analytic only) must route straight
    to the plain kernel — zero dirty machinery — and still be exact."""
    import jax.numpy as jnp

    from gpuraytracer_tpu.core.types import AnalyticPrimitive, IntersectorKind
    from gpuraytracer_tpu.models.builder import InstanceSpec, Material, SceneBuilder

    b = SceneBuilder()
    b.add_instance(InstanceSpec(
        kind=IntersectorKind.ANALYTIC,
        prim_type=int(AnalyticPrimitive.SPHERES),
        aabb_min=(-1.0, -1.0, -1.0), aabb_max=(1.0, 1.0, 1.0),
        material=Material((0.2, 0.9, 0.2, 1.0)),
    ))
    scene2 = b.build(aspect=2.0, elapsed_time=0.0)
    smem_args, kw = frame_kernel.pack_frame_params(scene2)
    W2, H2 = 32, 16
    full2 = np.asarray(frame_kernel.render_frame_tiles(
        *smem_args, width=W2, height=H2, max_depth=2, cull_backface=True,
        interpret=True, **kw,
    ))
    img, count = frame_kernel.render_frame_compact(
        *smem_args, width=W2, height=H2, max_depth=2, cull_backface=True,
        budget_cap=8, debug_count=True, interpret=True, **kw,
    )
    assert int(count) == 0
    np.testing.assert_array_equal(np.asarray(img), full2)


def test_compact_overflow_falls_back(scene):
    # Bigger frame so budget_cap=1 produces more dirty lanes than one tile
    # of queue capacity (at 64x36 every dirty lane fits in one tile; with
    # 32x128 tiles one tile is 4096 lanes, so the frame must be larger
    # still — 128x96 caps at ~49% dirty ~= 6k lanes).
    W2, H2 = 128, 96
    scene2 = builtin.build_scene(aspect=W2 / H2, elapsed_time=T_ANIM)
    smem_args, kw = frame_kernel.pack_frame_params(scene2)
    tile = frame_kernel.scene_kernel.TILE_ROWS * frame_kernel.scene_kernel.TILE_COLS
    img, count = frame_kernel.render_frame_compact(
        *smem_args, width=W2, height=H2, max_depth=3, cull_backface=True,
        budget_cap=1, cap_lanes=tile, debug_count=True, interpret=True, **kw,
    )
    # budget_cap=1 marks every capped marching lane dirty; one tile of
    # queue capacity must overflow and trigger the exact fallback.
    assert int(count) > tile
    full2 = np.asarray(
        frame_kernel.render_frame_tiles(
            *smem_args, width=W2, height=H2, max_depth=3,
            cull_backface=True, interpret=True, **kw,
        )
    )
    np.testing.assert_array_equal(np.asarray(img), full2)
