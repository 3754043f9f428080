"""Pallas TPU tile kernels for the sphere-trace hot loop.

The north-star design (BASELINE.json): the per-thread DXR march becomes a
"megakernel-style masked ray-batch loop" over vmapped wavefronts. XLA's
whole-batch while_loop pays the slowest lane of the WHOLE image per
geometry; this kernel grids the image into (8, 128)-pixel tiles, and every
tile runs its own early-exiting two-phase march:

  - tiles whose AABB gate mask is empty exit after zero iterations
    (the per-tile analog of DXR skipping geometry whose BVH node misses);
  - a tile's march length is its OWN slowest ray, not the frame's;
  - the 4-eval tetrahedral-normal validity check runs only on iterations
    where some lane in the tile paused at a crossing.

Semantics are identical to geometry/sdf.sphere_trace (same two-phase
pause/resume structure, same step accounting); tests pin the outputs
against the XLA path.
"""

from __future__ import annotations

import functools
import os
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuraytracer_tpu.core.types import SDF_HIT_THRESHOLD, SDF_MAX_STEPS
from gpuraytracer_tpu.kernels.soa import DISTANCE_FUNCTIONS_SOA, V3

# 128-col tiles keep every vector op in one native (8,128) f32 vreg; see
# the measured tile-shape sweep note in scene_kernel.py.
TILE_ROWS = 32
TILE_COLS = 128

_NORMAL_EPS = 0.5773 * 0.0001


def _tile_march_kernel(
    distance_fn: Callable[[V3], jnp.ndarray],
    cull_backface: bool,
    max_steps: int,
    unroll: int,
    escape_bound: bool,
    relax: float,
    capped_hit: bool,
    # refs:
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    gate_ref, tmax_ref, tstart_ref, scale_ref,
    thit_ref, nx_ref, ny_ref, nz_ref,
    *march_scratch,
):
    """Single-geometry tile march. The ONE marcher implementation lives in
    scene_kernel._march_sdf (VERDICT round-1 item 10 folded the duplicate);
    this kernel adds only the hit-normal epilogue the whole-scene kernel
    defers to its winner pass."""
    from gpuraytracer_tpu.kernels.scene_kernel import _march_sdf, _normal_at

    o = V3(ox_ref[:], oy_ref[:], oz_ref[:])
    d = V3(dx_ref[:], dy_ref[:], dz_ref[:])
    gate = gate_ref[:] != 0
    t_max = tmax_ref[:]
    # March start plane: zeros for reference semantics, the AABB-window
    # entry for extension primitives (see accel/traverse.py).
    t_start = tstart_ref[:]
    step_scale = scale_ref[0, 0]
    inf = jnp.float32(jnp.inf)

    _, t_hit, capped = _march_sdf(
        distance_fn, o, d, gate, t_max, step_scale, tuple(march_scratch),
        unroll=unroll, max_steps=max_steps, cull_backface=cull_backface,
        t_start=t_start, escape_bound=escape_bound, relax=relax,
    )
    if capped_hit:
        # Conservative occlusion on budget exhaustion (see
        # sdf.sphere_trace): the caller sets this only for occlusion
        # queries with a reduced budget; the t value is never consumed
        # (only the hit boolean is), so 0.0 is fine.
        t_hit = jnp.where(capped, 0.0, t_hit)

    hit = t_hit < inf
    safe = V3(
        jnp.where(hit, o.x + t_hit * d.x, 0.0),
        jnp.where(hit, o.y + t_hit * d.y, 0.0),
        jnp.where(hit, o.z + t_hit * d.z, 0.0),
    )
    n = _normal_at(distance_fn, safe)
    thit_ref[:] = jnp.where(hit, t_hit, inf)
    nx_ref[:] = n.x
    ny_ref[:] = n.y
    nz_ref[:] = n.z


@functools.partial(
    jax.jit,
    static_argnames=("prim_code", "cull_backface", "max_steps", "unroll",
                     "relax", "interpret", "capped_hit"),
)
def sphere_trace_tiles(
    origins,  # (H, W, 3) local-space
    directions,  # (H, W, 3)
    gate,  # (H, W) bool
    t_max,  # (H, W) f32
    step_scale,  # scalar f32
    *,
    prim_code: int,
    cull_backface: bool = True,
    max_steps: int = SDF_MAX_STEPS,
    unroll: int = 8,
    t_start=None,  # (H, W) f32 march start (AABB-windowed extensions)
    relax: float = 1.0,
    interpret: bool = False,
    capped_hit: bool = False,
):
    """Per-tile Pallas sphere trace. Returns (hit, t_hit, normal) like
    sdf.sphere_trace. H/W are padded to tile multiples internally."""
    distance_fn = DISTANCE_FUNCTIONS_SOA[int(prim_code)]
    h, w = gate.shape
    ph = (-h) % TILE_ROWS
    pw = (-w) % TILE_COLS

    def pad2(x, fill):
        if ph or pw:
            x = jnp.pad(x, ((0, ph), (0, pw)), constant_values=fill)
        return x

    if t_start is None:
        t_start = jnp.zeros_like(t_max)
    planes = [
        pad2(origins[..., 0], 0.0), pad2(origins[..., 1], 0.0), pad2(origins[..., 2], 0.0),
        pad2(directions[..., 0], 1.0), pad2(directions[..., 1], 0.0), pad2(directions[..., 2], 0.0),
        pad2(gate.astype(jnp.int32), 0),
        pad2(t_max.astype(jnp.float32), 0.0),
        pad2(t_start.astype(jnp.float32), 0.0),
    ]
    hp, wp = h + ph, w + pw
    grid = (hp // TILE_ROWS, wp // TILE_COLS)

    tile_spec = pl.BlockSpec(
        (TILE_ROWS, TILE_COLS),
        lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    scalar_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    from gpuraytracer_tpu.geometry import sdf as sdf_mod

    kernel = functools.partial(
        _tile_march_kernel, distance_fn, cull_backface, max_steps, unroll,
        int(prim_code) in sdf_mod.ESCAPE_SAFE_CODES, float(relax),
        bool(capped_hit),
    )
    vma = getattr(jax.typeof(planes[0]), "vma", None)
    kw = {"vma": vma} if vma else {}
    out_shape = jax.ShapeDtypeStruct((hp, wp), jnp.float32, **kw)
    thit, nx, ny, nz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec] * 9 + [scalar_spec],
        out_specs=[tile_spec] * 4,
        out_shape=[out_shape] * 4,
        scratch_shapes=[
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.float32),
            pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
        ],
        interpret=interpret,
    )(*planes, jnp.asarray(step_scale, dtype=jnp.float32).reshape(1, 1))

    thit = thit[:h, :w]
    normal = jnp.stack([nx[:h, :w], ny[:h, :w], nz[:h, :w]], axis=-1)
    hit = jnp.isfinite(thit)
    return hit, thit, normal


def pallas_available() -> bool:
    """Pallas path is used on TPU backends unless disabled via env."""
    if os.environ.get("GPURT_DISABLE_PALLAS"):
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False
