"""Whole-scene megakernel vs XLA traversal (interpret mode on CPU)."""

import dataclasses as dc

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.accel import traverse
from gpuraytracer_tpu.accel.instances import Scene, SceneLayout, ray_to_blas
from gpuraytracer_tpu.core import camera as cam
from gpuraytracer_tpu.core.types import RAY_TMAX
from gpuraytracer_tpu.kernels import scene_kernel
from gpuraytracer_tpu.models import builtin

W, H = 128, 48


@pytest.fixture(scope="module")
def rays_and_scene():
    scene = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    px, py = cam.pixel_grid(W, H)
    o, d = cam.generate_camera_rays(
        px, py, W, H,
        scene.arrays.constants.camera_position,
        scene.arrays.constants.projection_to_world,
    )
    return o, d, scene


def _run_kernel(o, d, scene, **kw):
    arrays = scene.arrays
    layout = scene.layout
    active = jnp.ones((H, W), bool)
    hit_p, t_p = traverse.intersect_plane(
        o, d, arrays.plane_origin, arrays.plane_size, t_min=0.0, t_max=RAY_TMAX
    )
    t0 = jnp.where(hit_p & active, t_p, RAY_TMAX)
    ob, db = ray_to_blas(o, d, arrays.blas_offset)
    params = scene_kernel.pack_params(arrays, arrays.constants.elapsed_time)
    geoms = tuple(
        (int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types)
    )
    return scene_kernel.scene_closest_tiles(
        ob, db, active, t0, *params, geoms=geoms, interpret=True, **kw
    )


def test_matches_xla_traversal(rays_and_scene):
    o, d, scene = rays_and_scene
    best_t, normal, gid = _run_kernel(o, d, scene)
    ref = traverse.closest_hit(o, d, scene)

    gk = np.asarray(gid)
    gx = np.asarray(ref.geometry_id)
    gx_proc = np.where(gx == scene.layout.plane_geometry_id, -1, gx)
    # Knife-edge marcher crossings may flip a pixel; require near-total
    # agreement, exact t/normal where ids agree.
    assert (gk == gx_proc).mean() > 0.999
    m = (gk >= 0) & (gk == gx_proc)
    assert m.any()
    np.testing.assert_allclose(
        np.asarray(best_t)[m], np.asarray(ref.t)[m], atol=2e-2
    )
    agree_n = np.abs(np.asarray(normal)[m] - np.asarray(ref.normal)[m]).max()
    assert agree_n < 0.2  # boundary pixels dominate the max; see test below


def test_interior_pixels_match_tightly(rays_and_scene):
    o, d, scene = rays_and_scene
    best_t, normal, gid = _run_kernel(o, d, scene)
    ref = traverse.closest_hit(o, d, scene)
    gk = np.asarray(gid)
    gx = np.asarray(ref.geometry_id)
    gx_proc = np.where(gx == scene.layout.plane_geometry_id, -1, gx)
    m = (gk >= 0) & (gk == gx_proc)
    td = np.abs(np.asarray(best_t)[m] - np.asarray(ref.t)[m])
    # 99% of agreeing pixels are within the radiance parity budget.
    assert np.quantile(td, 0.99) < 1e-3


def test_two_phase_bit_identical(rays_and_scene):
    """The budgeted-pass + dirty-tile-finisher scheme must equal the single
    full-budget pass BIT FOR BIT (scene_kernel.PHASE_BUDGET design
    invariant: a march that resolves within budget is a strict prefix of
    the full march; capped tiles re-traverse from scratch)."""
    o, d, scene = rays_and_scene
    arrays, layout = scene.arrays, scene.layout
    active = jnp.ones((H, W), bool)
    hit_p, t_p = traverse.intersect_plane(
        o, d, arrays.plane_origin, arrays.plane_size, t_min=0.0, t_max=RAY_TMAX
    )
    t0 = jnp.where(hit_p & active, t_p, RAY_TMAX)
    ob, db = ray_to_blas(o, d, arrays.blas_offset)
    params = scene_kernel.pack_params(arrays, arrays.constants.elapsed_time)
    geoms = tuple(
        (int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types)
    )
    t2, n2, g2 = scene_kernel.scene_closest_tiles(
        ob, db, active, t0, *params, geoms=geoms, two_phase=True, interpret=True
    )
    t1, n1, g1 = scene_kernel.scene_closest_tiles(
        ob, db, active, t0, *params, geoms=geoms, two_phase=False, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(g2))
    np.testing.assert_array_equal(np.asarray(t1), np.asarray(t2))
    np.testing.assert_array_equal(np.asarray(n1), np.asarray(n2))


def test_plane_id_merging(rays_and_scene):
    o, d, scene = rays_and_scene
    _, _, gid = _run_kernel(o, d, scene)
    ref = traverse.closest_hit(o, d, scene)
    plane_id = scene.layout.plane_geometry_id
    plane_ref = np.asarray(ref.geometry_id) == plane_id
    plane_kernel = np.asarray(gid) == -1
    # Wherever XLA says plane, the kernel must say "no procedural hit"
    # (modulo boundary flips).
    assert (plane_kernel | ~plane_ref).mean() > 0.999


def test_traversal_order_identical(rays_and_scene):
    """Near-first processing order (SceneLayout.traversal_order) is a pure
    scheduling choice: the closest-hit min-reduction result is identical
    to definition order, bit for bit."""
    o, d, scene = rays_and_scene
    arrays, layout = scene.arrays, scene.layout
    active = jnp.ones((H, W), bool)
    hit_p, t_p = traverse.intersect_plane(
        o, d, arrays.plane_origin, arrays.plane_size, t_min=0.0, t_max=RAY_TMAX
    )
    t0 = jnp.where(hit_p & active, t_p, RAY_TMAX)
    ob, db = ray_to_blas(o, d, arrays.blas_offset)
    params = scene_kernel.pack_params(arrays, arrays.constants.elapsed_time)
    geoms = tuple(
        (int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types)
    )
    assert layout.traversal_order is not None
    a = scene_kernel.scene_closest_tiles(
        ob, db, active, t0, *params, geoms=geoms, interpret=True
    )
    b = scene_kernel.scene_closest_tiles(
        ob, db, active, t0, *params, geoms=geoms,
        order=layout.traversal_order, interpret=True,
    )
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_builtin_clusters_bit_identical(rays_and_scene):
    """The builtin scene now clusters by default (8 march instances clear
    bvh.MARCH_FLAT_THRESHOLD): two-level traversal must be bit-identical
    to flat — the cluster gate only skips geometry whose merged slab the
    tile misses, and those could never win the closest reduction."""
    o, d, scene = rays_and_scene
    assert scene.layout.clusters is not None
    flat = _run_kernel(o, d, scene, order=scene.layout.traversal_order)
    clustered = _run_kernel(
        o, d, scene, order=scene.layout.traversal_order,
        clusters=scene.layout.clusters,
    )
    for a, b in zip(flat, clustered):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_cheap_batching_bit_identical(rays_and_scene, monkeypatch):
    """GPURT_NO_BATCH_CHEAP: batching consecutive closed-form geometries
    under one activity branch is result-identical — gates are unchanged,
    only the pl.when granularity differs."""
    o, d, scene = rays_and_scene
    batched = tuple(np.asarray(x) for x in _run_kernel(o, d, scene))
    monkeypatch.setenv("GPURT_NO_BATCH_CHEAP", "1")
    jax.clear_caches()  # the env knob is read at trace time
    try:
        unbatched = _run_kernel(o, d, scene)
        for a, b in zip(batched, unbatched):
            np.testing.assert_array_equal(a, np.asarray(b))
    finally:
        monkeypatch.delenv("GPURT_NO_BATCH_CHEAP")
        jax.clear_caches()
