"""Two-level bounds hierarchy (accel/bvh.py) — the LBVH analog.

Proves the seam behind the accel API is real (VERDICT round-1 item 7):
cluster builds partition instances deterministically, clustered kernel
traversal is bit-identical to flat traversal, and the SceneBuilder turns
clustering on automatically past the flat threshold so a 100+ instance
scene traverses through it end to end.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpuraytracer_tpu.accel import bvh, traverse
from gpuraytracer_tpu.core.types import AnalyticPrimitive, IntersectorKind
from gpuraytracer_tpu.kernels import scene_kernel
from gpuraytracer_tpu.models.builder import InstanceSpec, Material, SceneBuilder


def _grid_aabbs(n, spacing=3.0, size=2.0):
    mins, maxs = [], []
    side = int(np.ceil(np.sqrt(n)))
    for i in range(n):
        ix, iz = i % side, i // side
        mn = (ix * spacing - side, 0.0, iz * spacing - side)
        mins.append(mn)
        maxs.append((mn[0] + size, size, mn[2] + size))
    return np.asarray(mins, np.float32), np.asarray(maxs, np.float32)


def test_build_clusters_partition():
    mins, maxs = _grid_aabbs(37)
    clusters = bvh.build_clusters(mins, maxs, leaf_size=8)
    flat = sorted(i for c in clusters for i in c)
    assert flat == list(range(37))
    assert all(len(c) <= 8 for c in clusters)
    # Deterministic.
    assert clusters == bvh.build_clusters(mins, maxs, leaf_size=8)


def test_cluster_aabbs_cover_members():
    mins, maxs = _grid_aabbs(20)
    clusters = bvh.build_clusters(mins, maxs, leaf_size=4)
    cmin, cmax = bvh.cluster_aabbs(clusters, mins, maxs)
    for k, c in enumerate(clusters):
        assert (cmin[k] <= mins[list(c)]).all()
        assert (cmax[k] >= maxs[list(c)]).all()


def _stress_builder(n):
    b = SceneBuilder()
    mins, maxs = _grid_aabbs(n, spacing=4.0, size=3.0)
    for i in range(n):
        b.add_instance(
            InstanceSpec(
                kind=IntersectorKind.ANALYTIC,
                prim_type=int(AnalyticPrimitive.SPHERES),
                aabb_min=tuple(float(v) for v in mins[i]),
                aabb_max=tuple(float(v) for v in maxs[i]),
                material=Material((0.2 + 0.6 * (i % 3 == 0), 0.5, 0.5, 1.0)),
                scale=(1.5, 1.5, 1.5),
            )
        )
    return b


def test_builder_auto_clusters_past_threshold():
    few = _stress_builder(8).layout
    assert few.clusters is None
    many = _stress_builder(40).layout
    assert many.clusters is not None
    assert sorted(i for c in many.clusters for i in c) == list(range(40))


def test_clustered_kernel_matches_flat():
    """scene_closest_tiles with clusters == without, bit for bit (interpret
    mode on CPU; analytic geometry keeps it fast)."""
    n = 24
    b = _stress_builder(n)
    scene = b.build(aspect=2.0, elapsed_time=0.3)
    layout, arrays = scene.layout, scene.arrays
    assert layout.clusters is not None and len(layout.clusters) > 1

    h, w = 8, 256
    rng = np.random.default_rng(7)
    o = jnp.asarray(
        rng.uniform(-12, 12, size=(h, w, 3)).astype(np.float32)
    ).at[..., 1].set(8.0)
    d = rng.normal(size=(h, w, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    d = jnp.asarray(d)
    active = jnp.ones((h, w), dtype=bool)
    t0 = jnp.full((h, w), 1e4, dtype=jnp.float32)
    params = scene_kernel.pack_params(arrays, arrays.constants.elapsed_time)
    geoms = tuple(
        (int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types)
    )

    t_flat, n_flat, g_flat = scene_kernel.scene_closest_tiles(
        o, d, active, t0, *params, geoms=geoms, clusters=None, interpret=True
    )
    t_cl, n_cl, g_cl = scene_kernel.scene_closest_tiles(
        o, d, active, t0, *params, geoms=geoms, clusters=layout.clusters,
        interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(g_flat), np.asarray(g_cl))
    np.testing.assert_array_equal(np.asarray(t_flat), np.asarray(t_cl))
    np.testing.assert_array_equal(np.asarray(n_flat), np.asarray(n_cl))
    assert (np.asarray(g_flat) >= 0).any()  # scene actually gets hit


def test_stress_scene_closest_hit_many_instances():
    """A 100+ instance clustered scene traverses correctly: closest_hit on a
    modest ray batch (full-frame rendering of 100+ unrolled geometries is a
    multi-minute CPU compile — the per-ray query exercises the same path)."""
    b = _stress_builder(112)
    scene = b.build(aspect=16 / 9, elapsed_time=0.0)
    assert scene.layout.clusters is not None
    assert len(scene.layout.clusters) >= 112 // bvh.DEFAULT_LEAF_SIZE

    # Rays straight down onto a diagonal of instance centers: each must hit
    # ITS sphere cluster (centers at local origin, radius 0.6*1.5 = 0.9).
    mins = np.asarray(scene.arrays.aabb_min)
    maxs = np.asarray(scene.arrays.aabb_max)
    centers = (mins + maxs) / 2.0 + np.asarray([0.0, 1.0, 0.0])  # BLAS offset y+1
    pick = [0, 17, 63, 94, 111]
    o = jnp.asarray(
        np.stack([centers[i] + [0.0, 8.0, 0.0] for i in pick]).astype(np.float32)
    )
    d = jnp.asarray(np.tile([0.0, -1.0, 0.0], (len(pick), 1)).astype(np.float32))
    hit = traverse.closest_hit(o, d, scene)
    assert bool(jnp.all(hit.hit))
    np.testing.assert_array_equal(np.asarray(hit.geometry_id), pick)
    # The down-axis ray passes the big sphere (center (-0.3,-0.3,-0.3),
    # r=0.6 local) at lateral offset sqrt(0.18): entry at local
    # y = -0.3 + sqrt(0.36 - 0.18), scaled by 1.5.
    y_local = -0.3 + np.sqrt(0.36 - 0.18)
    np.testing.assert_allclose(
        np.asarray(hit.t), 8.0 - 1.5 * y_local, atol=1e-3
    )


def test_march_cluster_policy():
    """Cluster policy (accel/bvh.py): closed-form scenes keep the measured
    flat threshold (the 16-instance analytic grid is faster flat), while
    march-heavy scenes cluster at much smaller counts with the tighter
    march leaf (measured builtin win, 57.3 -> 55.05 ms at 1080p)."""
    assert not bvh.should_cluster(16, march_kinds=0)
    assert bvh.should_cluster(17, march_kinds=0)
    assert not bvh.should_cluster(10, march_kinds=7)
    assert bvh.should_cluster(10, march_kinds=8)
    assert bvh.leaf_size_for(10) == bvh.MARCH_LEAF_SIZE
    assert bvh.leaf_size_for(40) == bvh.DEFAULT_LEAF_SIZE

    from gpuraytracer_tpu.models import builtin

    cl = builtin.LAYOUT.clusters
    assert cl is not None
    assert sorted(i for c in cl for i in c) == list(range(10))
    assert all(len(c) <= bvh.MARCH_LEAF_SIZE for c in cl)
