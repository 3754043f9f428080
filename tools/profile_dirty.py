"""Dirty-mask statistics + two-phase vs single-phase frame time (TPU).

Reports, for the primary closest pass and the level-0 shadow pass at
1080p: dirty lanes per geometry bit, total dirty lanes, and tiles with
any dirty bit — the quantities that decide whether the pass-2 finisher
is cheap (few dirty tiles) or a full re-march (most tiles dirty).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gpuraytracer_tpu.accel import traverse
    from gpuraytracer_tpu.accel.instances import Scene, ray_to_blas
    from gpuraytracer_tpu.core import camera as cam
    from gpuraytracer_tpu.core import hlsl
    from gpuraytracer_tpu.core.types import RAY_TMAX
    from gpuraytracer_tpu.kernels import scene_kernel
    from gpuraytracer_tpu.models import builtin
    from gpuraytracer_tpu.render import trace

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    W, H = 1920, 1080
    scene = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    layout, arrays = scene.layout, scene.arrays
    geoms = tuple((int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types))
    names = builtin.GEOMETRY_NAMES

    @jax.jit
    def passes(arrays):
        px, py = cam.pixel_grid(W, H)
        o, d = cam.generate_camera_rays(
            px, py, W, H,
            arrays.constants.camera_position, arrays.constants.projection_to_world,
        )
        active = jnp.ones((H, W), bool)
        hit_p, t_p = traverse.intersect_plane(
            o, d, arrays.plane_origin, arrays.plane_size, t_min=0.0, t_max=RAY_TMAX
        )
        t0 = jnp.where(hit_p & active, t_p, RAY_TMAX)
        ob, db = ray_to_blas(o, d, arrays.blas_offset)
        params = scene_kernel.pack_params(arrays, arrays.constants.elapsed_time)
        bt, nrm, gid, dirty_c = scene_kernel.scene_closest_tiles(
            ob, db, active, t0, *params, geoms=geoms, debug_dirty=True
        )
        # level-0 shadow wavefront from the closest hits
        hit = gid >= 0
        t = jnp.where(hit, bt, jnp.where(hit_p, t0, RAY_TMAX))
        anyhit = hit | hit_p
        hp = o + t[..., None] * d
        sd = hlsl.normalize(arrays.constants.light_position[:3] - hp)
        hps, sds = ray_to_blas(hp, sd, arrays.blas_offset)
        hit_p2, _ = traverse.intersect_plane(
            hp, sd, arrays.plane_origin, arrays.plane_size, t_min=0.0, t_max=RAY_TMAX
        )
        t0s = jnp.where(hit_p2 & anyhit, 0.0, RAY_TMAX)
        _, _, gid_s, dirty_s = scene_kernel.scene_closest_tiles(
            hps, sds, anyhit & ~hit_p2, t0s, *params, geoms=geoms,
            accept_first=True, debug_dirty=True,
        )
        return dirty_c, dirty_s

    dirty_c, dirty_s = jax.device_get(passes(arrays))

    def stats(dirty, label):
        tr, tc = scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS
        ph, pw = (-dirty.shape[0]) % tr, (-dirty.shape[1]) % tc
        dirty = np.pad(dirty, ((0, ph), (0, pw)))
        tiles = dirty.reshape(
            dirty.shape[0] // tr, tr, dirty.shape[1] // tc, tc
        ).transpose(0, 2, 1, 3).reshape(-1, tr * tc)
        out = {
            "dirty_lanes_pct": round(float((dirty != 0).mean()) * 100, 2),
            "dirty_tiles_pct": round(float((tiles != 0).any(axis=1).mean()) * 100, 2),
        }
        per_g = {}
        for g, name in enumerate(names):
            cnt = int(((dirty >> min(g, 31)) & 1).sum())
            if cnt:
                tiles_g = float((((tiles >> min(g, 31)) & 1) != 0).any(axis=1).mean())
                per_g[name] = {"lanes": cnt, "tiles_pct": round(tiles_g * 100, 1)}
        out["per_geometry"] = per_g
        print(label, json.dumps(out, indent=1), flush=True)
        return out

    stats(dirty_c, "closest0:")
    stats(dirty_s, "shadow0:")


if __name__ == "__main__":
    main()
