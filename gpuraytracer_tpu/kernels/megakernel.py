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

TILE_ROWS = 8
TILE_COLS = 256

_NORMAL_EPS = 0.5773 * 0.0001


def _tile_march_kernel(
    distance_fn: Callable[[V3], jnp.ndarray],
    cull_backface: bool,
    max_steps: int,
    unroll: int,
    # refs:
    ox_ref, oy_ref, oz_ref,
    dx_ref, dy_ref, dz_ref,
    gate_ref, tmax_ref, scale_ref,
    thit_ref, nx_ref, ny_ref, nz_ref,
):
    o = V3(ox_ref[:], oy_ref[:], oz_ref[:])
    d = V3(dx_ref[:], dy_ref[:], dz_ref[:])
    gate = gate_ref[:] != 0
    t_max = tmax_ref[:]
    step_scale = scale_ref[0, 0]

    t_min = 0.0
    inf = jnp.float32(jnp.inf)

    def normal_at(p: V3) -> V3:
        e = _NORMAL_EPS
        # Tetrahedral offsets (+,-,-) (-,-,+) (-,+,-) (+,+,+), matching
        # sdf.calculate_normal.
        d1 = distance_fn(V3(p.x + e, p.y - e, p.z - e))
        d2 = distance_fn(V3(p.x - e, p.y - e, p.z + e))
        d3 = distance_fn(V3(p.x - e, p.y + e, p.z - e))
        d4 = distance_fn(V3(p.x + e, p.y + e, p.z + e))
        n = V3(
            e * d1 - e * d2 - e * d3 + e * d4,
            -e * d1 - e * d2 + e * d3 + e * d4,
            -e * d1 + e * d2 - e * d3 + e * d4,
        )
        return n.normalized()

    zero = o.x * 0.0
    izero = zero.astype(jnp.int32)
    # Result-identical retirement bound (geometry/sdf.march_escape_t).
    from gpuraytracer_tpu.geometry.sdf import march_escape_t

    t_escape = jnp.minimum(t_max, march_escape_t(o.length(), d.length()))
    # Masks ride the while carry as int32 — Mosaic cannot legalize i1
    # vector loop carries (scf.yield on vector<i1> fails).
    state0 = (
        zero + t_min,  # t
        izero,  # steps
        jnp.where(gate, izero, izero + 1),  # done
        izero,  # paused
        zero + inf,  # t_hit
    )

    def cond(state):
        _, _, done_i, _, _ = state
        return jnp.any(done_i == 0)

    def body(state):
        t, steps, done_i, paused_i, t_hit = state
        done = done_i != 0
        paused = paused_i != 0

        # Validity check for lanes paused at a crossing. Unlike the XLA
        # path this runs unconditionally (Mosaic cannot legalize an scf.if
        # with vector results); the cost — 4 distance evals — is amortized
        # over the `unroll` micro-steps below and masked lanes are no-ops.
        pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
        n = normal_at(pos)
        facing_ok = (d.dot(n) <= 0.0) if cull_backface else (t == t)
        in_range = (t >= t_min) & (t <= t_max)
        valid = paused & facing_ok & in_range
        t_hit = jnp.where(valid, t, t_hit)
        done = done | valid

        resume = paused & ~done
        paused = paused & ~paused

        for _ in range(unroll):
            marching = ~done & ~paused
            pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
            dist = distance_fn(pos)

            adv_resume = marching & resume
            fresh = marching & ~resume & (steps < max_steps)
            out_of_steps = marching & ~resume & (steps >= max_steps)
            done = done | out_of_steps

            crossed = dist <= SDF_HIT_THRESHOLD * t
            newly_paused = fresh & crossed
            advance = fresh & ~crossed
            steps = steps + jnp.where(fresh, 1, 0)

            moved = adv_resume | advance
            t = jnp.where(moved, t + step_scale * dist, t)
            done = done | (moved & (t > t_escape))
            paused = paused | newly_paused
            resume = resume & ~adv_resume
        return (
            t,
            steps,
            done.astype(jnp.int32),
            paused.astype(jnp.int32),
            t_hit,
        )

    _, _, _, _, t_hit = jax.lax.while_loop(cond, body, state0)

    hit = t_hit < inf
    pos_hit = V3(o.x + t_hit * d.x, o.y + t_hit * d.y, o.z + t_hit * d.z)
    safe = V3(
        jnp.where(hit, pos_hit.x, 0.0),
        jnp.where(hit, pos_hit.y, 0.0),
        jnp.where(hit, pos_hit.z, 0.0),
    )
    n = normal_at(safe)
    thit_ref[:] = jnp.where(hit, t_hit, inf)
    nx_ref[:] = n.x
    ny_ref[:] = n.y
    nz_ref[:] = n.z


@functools.partial(
    jax.jit,
    static_argnames=("prim_code", "cull_backface", "max_steps", "unroll", "interpret"),
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
    interpret: bool = False,
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

    planes = [
        pad2(origins[..., 0], 0.0), pad2(origins[..., 1], 0.0), pad2(origins[..., 2], 0.0),
        pad2(directions[..., 0], 1.0), pad2(directions[..., 1], 0.0), pad2(directions[..., 2], 0.0),
        pad2(gate.astype(jnp.int32), 0),
        pad2(t_max.astype(jnp.float32), 0.0),
    ]
    hp, wp = h + ph, w + pw
    grid = (hp // TILE_ROWS, wp // TILE_COLS)

    tile_spec = pl.BlockSpec(
        (TILE_ROWS, TILE_COLS),
        lambda i, j: (i, j),
        memory_space=pltpu.VMEM,
    )
    scalar_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0), memory_space=pltpu.SMEM)

    kernel = functools.partial(
        _tile_march_kernel, distance_fn, cull_backface, max_steps, unroll
    )
    vma = getattr(jax.typeof(planes[0]), "vma", None)
    kw = {"vma": vma} if vma else {}
    out_shape = jax.ShapeDtypeStruct((hp, wp), jnp.float32, **kw)
    thit, nx, ny, nz = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tile_spec] * 8 + [scalar_spec],
        out_specs=[tile_spec] * 4,
        out_shape=[out_shape] * 4,
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
