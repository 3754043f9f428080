"""Whole-scene traversal megakernel.

One Pallas kernel per traversal pass: every (8,128)-pixel tile walks ALL
procedural geometries in-register — in-kernel AABB gating, local-space
transform from SMEM matrix rows, the per-kind intersector (SDF two-phase
march / metaball fixed-step march / analytic closed forms), and a running
closest-hit reduction whose best_t doubles as the shrinking RayTCurrent
for every later geometry (per-TILE, sharper than the XLA path's per-frame
chaining).

vs the per-geometry kernels (megakernel.py): rays are DMA'd once per pass
instead of once per geometry, per-tile fixed costs are paid once, and a
tile whose best_t is already closer than a geometry's AABB entry skips
that geometry outright.

The plane (triangle geometry) stays in XLA — it is closed-form elementwise
— and enters as the initial t bound (t0); accel/traverse.py merges ids.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpuraytracer_tpu.core.types import (
    IntersectorKind,
    METABALL_ISO_THRESHOLD,
    METABALL_MAX_STEPS,
    SDF_HIT_THRESHOLD,
    SDF_MAX_STEPS,
    AnalyticPrimitive,
)
from gpuraytracer_tpu.kernels import soa
from gpuraytracer_tpu.kernels.soa import V3

# Tile shape. 128 cols = ONE native (8,128) f32 vreg per op row-group —
# 256-col tiles split every vector op into two vregs. Round-3 re-sweep
# with the cycle-retirement marcher (1080p builtin device slope, ms):
# 8x256 45.1, 16x256 39.4, 16x128 36.0, 32x128 u8 32.5 / u12 31.6,
# 48x128 57.4, 64x128 55.8-59.9 (VMEM scratch spill), 8x128 54.5 (tile
# count fixed costs). 32x128 also quarters the per-(tile,geometry) visit
# count vs 8x256 at equal lane totals. The round-2 8x256 choice was an
# artifact of the pre-retirement convoy dynamics.
TILE_ROWS = 32
TILE_COLS = 128

# Tile policy: extension DE fractals (relaxed marches, AABB-windowed
# starts, back-face cull off) measured the OPPOSITE tall-tile trend at
# 1080p — 32x128 47.4, 16x128 25.8, 8x256 31.0, 8x128 39.9 ms. Their
# per-lane step counts are deep and irregular (power-8 DE fields), so
# convoy width dominates visit fixed costs; everything else (builtin,
# SDF showcase, metaballs, grid) prefers 32x128. render entry points call
# apply_tile_policy per scene; profiling tools that set the tile shape
# directly switch TILE_AUTO off.
TILE_AUTO = True


def apply_tile_policy(layout) -> None:
    """Per-scene tile shape (read at trace time by every kernel builder;
    each scene's kernels compile separately, so scenes can disagree)."""
    global TILE_ROWS, TILE_COLS
    if not TILE_AUTO:
        return
    from gpuraytracer_tpu.kernels import megakernel

    deep_march = any(
        int(k) == int(IntersectorKind.SIGNED_DISTANCE) and int(p) >= 7
        for k, p in zip(layout.kinds, layout.prim_types)
    )
    rows = 16 if deep_march else 32
    TILE_ROWS = megakernel.TILE_ROWS = rows
    TILE_COLS = megakernel.TILE_COLS = 128
_NORMAL_EPS = 0.5773 * 0.0001
_MB_NORMAL_EPS = 0.5773 * 0.00001

# Two-phase march scheme: pass 1 marches every tile with this per-lane step
# budget; lanes that cap without resolving mark the tile dirty, and pass 2
# re-traverses ONLY dirty tiles with the full reference budgets (512 SDF /
# 128 metaball) using the inline-check marchers. Bit-identical to a single
# full-budget pass (a march that resolves within the budget is a strict
# prefix of the full march), but a tile's cost is bounded by its own
# honest work instead of its worst crawl lane: invalid-crossing lanes
# (step ~ 1e-4*t after a culled crossing, e.g. shadow rays leaving an SDF
# surface) otherwise advance ~1 step per while iteration and hold all 2048
# lanes hostage for 512 iterations. Measured on v5e at 1080p: 76 -> ~50 ms.
PHASE_BUDGET = 64

# Micro-steps per outer while iteration in the guarded marchers. Smaller
# unrolls check done/paused more often (finer convoy granularity, faster
# crawl-resume cadence) at the cost of more while-loop iterations;
# module-level so profiling tools can sweep them. Round-3 sweeps with the
# cycle-retirement marcher (1080p builtin device slopes): at 8x256 tiles
# 8/10/12 -> 45.1/43.4/42.5; at the new 32x128 tiles 8/10/12 ->
# 32.5/~31.6/31.6 (u10's 30.05 slope reading rode an inflated t1; the
# 4-frame totals rank u12 best). 12 stays the default.
UNROLL_SDF = 12
UNROLL_MB = 16

# Occlusion (accept-first) marches may use their own unroll: shadow lanes
# finish at far more diverse times than closest-hit lanes (any crossing
# retires a lane instantly, and self-origin crawls sit next to instant
# plane-occluded exits), so a finer check cadence tightens the convoy.
# 0 = inherit UNROLL_SDF. Result-exact (unroll is micro-step batching).
UNROLL_SDF_SHADOW = 0

# March convoy granularity: the march while-loops run independently on
# TILE_COLS / MARCH_HALVES column blocks, so one slow (crawl) lane stalls
# only its own block instead of the whole tile, while per-tile fixed costs
# (gates, transforms, epilogues) stay amortized at full tile width. 1 =
# whole tile; 2 = (8, 128) blocks (the native VPU width). Result-exact
# (marches are per-lane independent).
MARCH_HALVES = 1

# Straggler tail phase: when at most TAIL_THRESH lanes of a tile are still
# marching, switch from the UNROLL_SDF-step outer iterations to
# TAIL_UNROLL-step ones. Crawl lanes (pause -> invalid check -> resume)
# advance ~1 step per outer iteration whatever the unroll, so a smaller
# tail unroll converges the convoy in fewer wasted masked evals
# (unroll + 4 check evals buy ~1 crawl advance). Result-exact: the unroll
# is micro-step batching only. 0 disables the tail phase.
TAIL_UNROLL = 0
TAIL_THRESH = 48

# Occlusion (accept-first) traversals may use the INLINE-check marchers
# (validity evaluated at every micro-step, ~5 distance evals per step):
# crawl lanes — shadow rays leaving the surface they start on — advance
# every micro-step instead of ~2 steps per pause/check outer iteration.
# Costs ~3.8x on legitimately long marches (metaball interval misses), so
# default off pending measurement; profiling knob.
SHADOW_INLINE = False

# Merged occlusion marching (_march_sdf_multi): ONE while loop advances
# every SDF geometry's occlusion march concurrently with per-geometry
# VMEM state banks and a cross-geometry kill on any valid hit — the
# north-star "work list" form, result-exact for accept-first queries.
# Default set by measurement; env GPURT_MERGED_SHADOW=0/1 overrides.
MERGED_SHADOW = False


def merged_shadow_enabled() -> bool:
    v = os.environ.get("GPURT_MERGED_SHADOW", "")
    if v in ("0", "1"):
        return v == "1"
    return MERGED_SHADOW

# Closed-form geometry kinds whose whole intersector body costs about as
# much as the pl.when plumbing around it (a tile-wide any-reduction + a
# Mosaic branch per geometry per traversal). Consecutive runs of these in
# the traversal order share ONE activity branch: their slab gates are
# evaluated up front, the run's bodies sit under a single
# pl.when(any(union)), and each body is masked per-lane by its own gate —
# result-identical (the closest/accept-first reductions are unchanged and
# run in the same order), but a scene like the 16-instance analytic grid
# pays 1 branch per tile per traversal instead of 16. March kinds keep
# their individual branches (their bodies are while loops — skipping a
# gated-out march is the whole point). Knob: GPURT_NO_BATCH_CHEAP.
_CHEAP_KINDS = (int(IntersectorKind.ANALYTIC), int(IntersectorKind.TRIANGLE))


def _batch_cheap() -> bool:
    return not os.environ.get("GPURT_NO_BATCH_CHEAP")


# Cap on how many closed-form geometries share one activity branch. A
# whole-scene batch pays every member's body when any lane needs any
# member; smaller runs trade extra Mosaic branches for tighter gating
# (profiling knob; 0 = unlimited).
CHEAP_RUN_MAX = 0

# Profiling knob (GPURT_CHECK_DIRECTIONAL): the pause-check's facing test
# via a 2-eval directional difference f(p + h*d) - f(p) instead of the
# 4-eval tetrahedral normal + normalize. sign(directional derivative) ==
# sign(dot(d, n)) mathematically, but the two float approximations can
# disagree on near-tangent crossings, so this is NOT bit-aligned with the
# reference's IsAValidHit (Raytracing.hlsl) — measurement only unless the
# win justifies a parity re-ratchet.
def _check_directional() -> bool:
    return bool(os.environ.get("GPURT_CHECK_DIRECTIONAL"))


def _split_v3(v: V3, h: int, n: int) -> V3:
    w = v.x.shape[-1] // n
    sl = slice(h * w, (h + 1) * w)
    return V3(v.x[..., sl], v.y[..., sl], v.z[..., sl])


def _march_split(part_fn, o, d, gate, t_max, scratch, n, t_start=None):
    """Run a marcher independently over n column blocks (sliced values +
    sliced scratch-ref views), concatenating the per-block results."""
    w = gate.shape[-1] // n
    hits, ts, caps = [], [], []
    for h in range(n):
        sl = slice(h * w, (h + 1) * w)
        out = part_fn(
            _split_v3(o, h, n), _split_v3(d, h, n), gate[..., sl],
            t_max[..., sl],
            tuple(r.at[:, sl] for r in scratch),
            t_start[..., sl] if t_start is not None else None,
        )
        hits.append(out[0])
        ts.append(out[1])
        caps.append(out[2])
    return (
        jnp.concatenate(hits, axis=-1),
        jnp.concatenate(ts, axis=-1),
        jnp.concatenate(caps, axis=-1),
    )


def _march_sdf(distance_fn, o: V3, d: V3, gate, t_max, step_scale, scratch,
               unroll=None, max_steps=SDF_MAX_STEPS, cull_backface=True,
               t_start=None, escape_bound=True, relax=1.0):
    n = MARCH_HALVES
    if n <= 1 or gate.shape[-1] % (n * 128) != 0:
        return _march_sdf_part(distance_fn, o, d, gate, t_max, step_scale,
                               scratch, unroll=unroll, max_steps=max_steps,
                               cull_backface=cull_backface, t_start=t_start,
                               escape_bound=escape_bound, relax=relax)
    return _march_split(
        lambda oo, dd, g, tm, sc, ts: _march_sdf_part(
            distance_fn, oo, dd, g, tm, step_scale, sc, unroll=unroll,
            max_steps=max_steps, cull_backface=cull_backface, t_start=ts,
            escape_bound=escape_bound, relax=relax,
        ),
        o, d, gate, t_max, scratch, n, t_start=t_start,
    )


def _march_metaballs(o: V3, d: V3, gate, t_max, balls, scratch, unroll=None,
                     max_steps=METABALL_MAX_STEPS,
                     step_div=METABALL_MAX_STEPS):
    n = MARCH_HALVES
    if n <= 1 or gate.shape[-1] % (n * 128) != 0:
        return _march_metaballs_part(o, d, gate, t_max, balls, scratch,
                                     unroll=unroll, max_steps=max_steps,
                                     step_div=step_div)
    return _march_split(
        lambda oo, dd, g, tm, sc, ts: _march_metaballs_part(
            oo, dd, g, tm, balls, sc, unroll=unroll, max_steps=max_steps,
            step_div=step_div,
        ),
        o, d, gate, t_max, scratch, n,
    )


def _normal_at(distance_fn, p: V3) -> V3:
    e = _NORMAL_EPS
    d1 = distance_fn(V3(p.x + e, p.y - e, p.z - e))
    d2 = distance_fn(V3(p.x - e, p.y - e, p.z + e))
    d3 = distance_fn(V3(p.x - e, p.y + e, p.z - e))
    d4 = distance_fn(V3(p.x + e, p.y + e, p.z + e))
    return V3(
        e * d1 - e * d2 - e * d3 + e * d4,
        -e * d1 - e * d2 + e * d3 + e * d4,
        -e * d1 + e * d2 - e * d3 + e * d4,
    ).normalized()


def _march_sdf_part(distance_fn, o: V3, d: V3, gate, t_max, step_scale, scratch,
                    unroll=None, max_steps=SDF_MAX_STEPS, cull_backface=True,
                    t_start=None, escape_bound=True, relax=1.0):
    """Pause/check sphere trace over one tile (or sub-tile column block;
    see _march_sdf), march state in VMEM scratch
    refs. Bit-identical to the reference march semantics
    (SignedDistancePrimitives.hlsli:287-319, same step accounting as
    geometry/sdf.sphere_trace): crossings pause the lane, the validity
    check (tetrahedral normal + cull + t-range) runs at the next outer
    iteration, invalid lanes resume with one forced advance.

    The ref-state form exists so the 4-eval validity check can sit under
    pl.when(any lane paused): outer iterations where nothing paused march
    unroll steps for unroll evals instead of unroll+4 (the value-carry
    form paid the check every iteration — ~25% of all march evals on
    clean tiles)."""
    if unroll is None:
        unroll = UNROLL_SDF
    (t_ref, steps_ref, done_ref, paused_ref, resume_ref, thit_ref,
     rprev_ref, oon_ref) = scratch
    relaxed = relax > 1.0
    inf = jnp.float32(jnp.inf)
    zero = o.x * 0.0
    izero = zero.astype(jnp.int32)
    # Result-identical retirement bound: no crossing can exist past
    # (|o| + R) / (|d| - alpha*threshold) — see geometry/sdf.march_escape_t.
    # Sky/occlusion lanes with RayTCurrent 10000 stop ~100x sooner.
    # Applied only to envelope-verified codes (sdf.ESCAPE_SAFE_CODES);
    # extension primitives rely on their AABB window (t_max) instead.
    from gpuraytracer_tpu.geometry.sdf import march_escape_t

    if escape_bound:
        t_escape = jnp.minimum(t_max, march_escape_t(o.length(), d.length()))
    else:
        t_escape = t_max

    # t_start: optional per-lane march start (0 = the reference's RayTMin
    # semantics; extension AABB-windowed primitives start at slab entry).
    t_ref[:] = zero if t_start is None else zero + t_start
    steps_ref[:] = izero
    done_ref[:] = jnp.where(gate, izero, izero + 1)
    paused_ref[:] = izero
    resume_ref[:] = izero
    thit_ref[:] = zero + inf
    if relaxed:
        rprev_ref[:] = zero
        oon_ref[:] = izero + 1
    else:
        # Cycle detection (non-relaxed marches): rprev doubles as the
        # lane's previous t. -1 never matches a real march t (t >= 0).
        rprev_ref[:] = zero - 1.0

    def check():
        # Validity check for paused lanes (Raytracing.hlsl IsAValidHit).
        # Runs only when some lane in the tile is paused; with no paused
        # lanes it is the identity, so guarding it is result-exact.
        t = t_ref[:]
        paused = paused_ref[:] != 0
        pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
        if not cull_backface:
            facing_ok = t == t
        elif _check_directional():
            h = jnp.float32(1e-4)
            ahead = V3(pos.x + h * d.x, pos.y + h * d.y, pos.z + h * d.z)
            facing_ok = distance_fn(ahead) - distance_fn(pos) <= 0.0
        else:
            n = _normal_at(distance_fn, pos)
            facing_ok = d.dot(n) <= 0.0
        in_range = (t >= 0.0) & (t <= t_max)
        valid = paused & facing_ok & in_range
        thit_ref[:] = jnp.where(valid, t, thit_ref[:])
        done_ref[:] = done_ref[:] | valid.astype(jnp.int32)
        resume_ref[:] = (paused & ~valid).astype(jnp.int32)
        paused_ref[:] = izero

    def make_body(n_micro, counting):
      def body(carry):
        pl.when(jnp.any(paused_ref[:] != 0))(check)
        # Refs touch VMEM once per outer iteration; the unrolled
        # micro-steps run on register values (10 fewer vector memory ops
        # per step than per-micro-step ref traffic).
        t = t_ref[:]
        steps = steps_ref[:]
        done = done_ref[:] != 0
        paused = paused_ref[:] != 0
        resume = resume_ref[:] != 0
        if relaxed:
            rprev = rprev_ref[:]
            oon = oon_ref[:] != 0
        else:
            t_prev = rprev_ref[:]
        for _ in range(n_micro):
            marching = ~done & ~paused
            pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
            dist = distance_fn(pos)
            adv_resume = marching & resume
            fresh = marching & ~resume & (steps < max_steps)
            done = done | (marching & ~resume & (steps >= max_steps))
            if relaxed:
                # Over-relaxation (sdf.extension_relax): overshoot when
                # consecutive safety spheres are disjoint (the step_scale
                # cancels); failed lanes step back inside the previous
                # sphere and march plainly from then on.
                fail = fresh & oon & (dist + rprev < relax * rprev)
                crossed = (dist <= SDF_HIT_THRESHOLD * t) & ~fail
            else:
                crossed = dist <= SDF_HIT_THRESHOLD * t
            newly_paused = fresh & crossed
            advance = fresh & ~crossed
            steps = steps + jnp.where(fresh, 1, 0)
            moved = adv_resume | advance
            if relaxed:
                # Retire on the UNRELAXED reach — sound mid-overshoot.
                # Escape retire is sound only with an intact sphere chain;
                # failed-overshoot lanes may have a crossing BEHIND the
                # sample and must back-step instead (see sdf.sphere_trace).
                done = done | (
                    moved & ~fail & (t + step_scale * dist > t_escape)
                )
                plain = step_scale * dist
                fail_step = ((1.0 - relax) * relax) * (step_scale * rprev)
                stepv = jnp.where(
                    fail, fail_step,
                    jnp.where(oon & ~adv_resume, relax * plain, plain),
                )
                # Sub-ulp cycle retirement, relaxed form: a non-fail
                # advance that does not change t repeats forever (same
                # dist next step; the fail predicate with rprev == dist
                # reduces to dist < 0.6*dist, false for dist > 0, so no
                # back-step ever fires from a stuck state). Fail lanes
                # are excluded: their continuation switches to plain
                # stepping, which can still advance.
                stuck = moved & ~fail & (t + stepv == t)
                t = jnp.where(moved, t + stepv, t)
                done = done | stuck
                oon = oon & ~fail & ~adv_resume
                rprev = jnp.where(moved, dist, rprev)
            else:
                t_new = t + step_scale * dist
                # Exact cycle retirement: the march is a deterministic
                # function of t alone, so an advance that lands on a
                # float-identical t (sub-ulp step — the reference's
                # `t += stepScale * distance` no-op) or returns to the
                # previous t (the negative-distance oscillation pair
                # after an invalid back-face crossing) repeats forever;
                # the reference burns its remaining 512 iterations on it
                # and returns false (SignedDistancePrimitives.hlsli:
                # 294-319). Retiring the lane as a miss NOW is
                # result-identical and stops one oscillating lane from
                # convoying its whole tile to the step budget.
                stuck = moved & ((t_new == t) | (t_new == t_prev))
                t_prev = jnp.where(moved, t, t_prev)
                t = jnp.where(moved, t_new, t)
                done = done | (moved & (t > t_escape)) | stuck
            paused = paused | newly_paused
            resume = resume & ~adv_resume
        t_ref[:] = t
        steps_ref[:] = steps
        done_ref[:] = done.astype(jnp.int32)
        paused_ref[:] = paused.astype(jnp.int32)
        resume_ref[:] = resume.astype(jnp.int32)
        if relaxed:
            rprev_ref[:] = rprev
            oon_ref[:] = oon.astype(jnp.int32)
        else:
            rprev_ref[:] = t_prev
        # Paused lanes always have done == 0, so lanes that paused on the
        # last micro-step keep the loop alive for their validity check.
        if counting:
            return jnp.sum((~done).astype(jnp.int32))
        return jnp.any(~done)

      return body

    tail = TAIL_UNROLL
    if tail and tail < unroll:
        # Straggler tail: run full-unroll iterations while more than
        # TAIL_THRESH lanes march, then finish the convoy with short
        # iterations (see TAIL_UNROLL). Identical micro-step semantics.
        jax.lax.while_loop(
            lambda c: c > TAIL_THRESH, make_body(unroll, True),
            jnp.sum((done_ref[:] == 0).astype(jnp.int32)),
        )
        jax.lax.while_loop(
            lambda c: c, make_body(tail, False), jnp.any(done_ref[:] == 0)
        )
    else:
        jax.lax.while_loop(
            lambda c: c, make_body(unroll, False), jnp.any(done_ref[:] == 0)
        )
    t_hit = thit_ref[:]
    # The winning hit's normal is recomputed in the kernel epilogue, only
    # for tiles this geometry actually won (pl.when) — computing it here
    # unconditionally cost ~40 distance evals per tile across the scene.
    # capped: lanes that ran out of budget without resolving — meaningful
    # only when max_steps is a phase budget below the geometry's real one
    # (the two-phase dirty-tile scheme, see scene_closest_tiles).
    capped = gate & (steps_ref[:] >= max_steps) & (t_hit == jnp.inf)
    return t_hit < inf, t_hit, capped


def _march_sdf_multi(parts, killed_ref, killed0, unroll=None):
    """Merged occlusion march — the north star's "ray work list" adapted
    to SIMD tiles: ONE while loop advances EVERY signed-distance
    geometry's occlusion march concurrently, each geometry under its own
    pl.when(any lane unfinished) section with its own VMEM state bank.

    Versus the sequential per-geometry loops (_march_sdf per geometry,
    each running to its slowest lane before the next starts) this
      (a) pays the outer-loop fixed costs max_g(iters) times instead of
          sum_g(iters), and
      (b) kills EVERY geometry's march for a lane the moment ANY geometry
          registers a valid occlusion hit. An accept-first query needs one
          witness (TraceShadowRayAndReportIfHit, Raytracing.hlsl:115-146;
          RAY_FLAG_ACCEPT_FIRST_HIT_AND_END_SEARCH ends traversal exactly
          like this), so the kill is result-exact: per-geometry step
          sequences are bit-identical to the sequential marches
          (independent state), and kills only discard work whose result
          the OR-reduction discards anyway.

    parts: per-geometry dicts with
      fn          SoA distance function (local space)
      ray()       -> (o_loc V3, d_loc V3); evaluated ONCE at init and
                  stored in the bank (per-iteration recompute measured
                  +5 ms/frame on builtin — the escape/length
                  transcendentals dominate a section's fixed cost)
      gate        entry gate plane (bool)
      t_lo        march start plane or None (AABB-windowed extensions)
      t_max()     -> plane; the live RayTCurrent bound intersected with
                  the AABB window for extension codes (constant during the
                  merged loop: closed forms ran before, the epilogue
                  writes after); evaluated once at init
      budget      step budget (int, or traced i32 when the per-level
                  occlusion cap selects it by value — comparison-only)
      escape      bool — march_escape_t retirement applies (codes in
                  sdf.ESCAPE_SAFE_CODES)
      relax       over-relaxation omega (1.0 = reference stepping)
      cull        back-face cull in the validity check
      scratch     16-plane VMEM bank: the _march_sdf_part 8 (t, steps,
                  done, paused, resume, thit, rprev, oon) + the
                  loop-constant planes (o_loc xyz, d_loc xyz, t_escape,
                  t_max), written once at init
    killed_ref: shared i32 plane — lanes with a registered occlusion hit.

    The micro-step semantics are transcribed from _march_sdf_part (the
    source of truth — see its comments); equality is pinned bit-exactly by
    tests/test_merged_shadow.py.
    """
    from gpuraytracer_tpu.geometry.sdf import march_escape_t

    if unroll is None:
        unroll = UNROLL_SDF
    inf = jnp.float32(jnp.inf)

    killed_ref[:] = killed0.astype(jnp.int32)

    # ---- init every bank (gate + window evaluated once) ----------------
    for p in parts:
        done_ref = p["scratch"][2]
        gate = p["gate"] & ~(killed0)
        zero = gate.astype(jnp.float32) * 0.0
        izero = zero.astype(jnp.int32)
        # done must be reset unconditionally (scratch is reused across
        # traversals — stale zeros would keep the loop alive on garbage);
        # the remaining planes only matter for gated lanes (stale values
        # are masked by done everywhere downstream).
        done_ref[:] = jnp.where(gate, izero, izero + 1)

        def init_rest(p=p, gate=gate, zero=zero, izero=izero):
            (t_ref, steps_ref, _, paused_ref, resume_ref, thit_ref,
             rprev_ref, oon_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
             dz_ref, tesc_ref, tmax_ref) = p["scratch"]
            t_ref[:] = zero if p["t_lo"] is None else zero + p["t_lo"]
            steps_ref[:] = izero
            paused_ref[:] = izero
            resume_ref[:] = izero
            if p["relax"] > 1.0:
                rprev_ref[:] = zero
                oon_ref[:] = izero + 1
            else:
                rprev_ref[:] = zero - 1.0
            o, d = p["ray"]()
            ox_ref[:] = o.x
            oy_ref[:] = o.y
            oz_ref[:] = o.z
            dx_ref[:] = d.x
            dy_ref[:] = d.y
            dz_ref[:] = d.z
            t_max = p["t_max"]()
            tmax_ref[:] = t_max
            if p["escape"]:
                tesc_ref[:] = jnp.minimum(
                    t_max, march_escape_t(o.length(), d.length()))
            else:
                tesc_ref[:] = t_max

        pl.when(jnp.any(gate))(init_rest)

    def section(p):
        (t_ref, steps_ref, done_ref, paused_ref, resume_ref, thit_ref,
         rprev_ref, oon_ref, ox_ref, oy_ref, oz_ref, dx_ref, dy_ref,
         dz_ref, tesc_ref, tmax_ref) = p["scratch"]
        distance_fn = p["fn"]
        relaxed = p["relax"] > 1.0
        relax = p["relax"]
        max_steps = p["budget"]
        o = V3(ox_ref[:], oy_ref[:], oz_ref[:])
        d = V3(dx_ref[:], dy_ref[:], dz_ref[:])
        t_max = tmax_ref[:]
        step_scale = p["step_scale"]()
        t_escape = tesc_ref[:]
        izero = (o.x * 0.0).astype(jnp.int32)

        def check():
            t = t_ref[:]
            paused = paused_ref[:] != 0
            pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
            if not p["cull"]:
                facing_ok = t == t
            elif _check_directional():
                h = jnp.float32(1e-4)
                ahead = V3(pos.x + h * d.x, pos.y + h * d.y, pos.z + h * d.z)
                facing_ok = distance_fn(ahead) - distance_fn(pos) <= 0.0
            else:
                n = _normal_at(distance_fn, pos)
                facing_ok = d.dot(n) <= 0.0
            in_range = (t >= 0.0) & (t <= t_max)
            valid = paused & facing_ok & in_range
            killed_ref[:] = killed_ref[:] | valid.astype(jnp.int32)
            done_ref[:] = done_ref[:] | valid.astype(jnp.int32)
            resume_ref[:] = (paused & ~valid).astype(jnp.int32)
            paused_ref[:] = izero

        pl.when(jnp.any(paused_ref[:] != 0))(check)
        t = t_ref[:]
        steps = steps_ref[:]
        # Cross-geometry kill: another geometry's witness retires this
        # lane's march here (the accept-first end-of-search).
        done = (done_ref[:] | killed_ref[:]) != 0
        paused = paused_ref[:] != 0
        resume = resume_ref[:] != 0
        if relaxed:
            rprev = rprev_ref[:]
            oon = oon_ref[:] != 0
        else:
            t_prev = rprev_ref[:]
        for _ in range(unroll):
            marching = ~done & ~paused
            pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
            dist = distance_fn(pos)
            adv_resume = marching & resume
            fresh = marching & ~resume & (steps < max_steps)
            done = done | (marching & ~resume & (steps >= max_steps))
            if relaxed:
                fail = fresh & oon & (dist + rprev < relax * rprev)
                crossed = (dist <= SDF_HIT_THRESHOLD * t) & ~fail
            else:
                crossed = dist <= SDF_HIT_THRESHOLD * t
            newly_paused = fresh & crossed
            advance = fresh & ~crossed
            steps = steps + jnp.where(fresh, 1, 0)
            moved = adv_resume | advance
            if relaxed:
                # Escape retire is sound only with an intact sphere chain;
                # failed-overshoot lanes may have a crossing BEHIND the
                # sample and must back-step instead (see sdf.sphere_trace).
                done = done | (
                    moved & ~fail & (t + step_scale * dist > t_escape)
                )
                plain = step_scale * dist
                fail_step = ((1.0 - relax) * relax) * (step_scale * rprev)
                stepv = jnp.where(
                    fail, fail_step,
                    jnp.where(oon & ~adv_resume, relax * plain, plain),
                )
                stuck = moved & ~fail & (t + stepv == t)
                t = jnp.where(moved, t + stepv, t)
                done = done | stuck
                oon = oon & ~fail & ~adv_resume
                rprev = jnp.where(moved, dist, rprev)
            else:
                t_new = t + step_scale * dist
                stuck = moved & ((t_new == t) | (t_new == t_prev))
                t_prev = jnp.where(moved, t, t_prev)
                t = jnp.where(moved, t_new, t)
                done = done | (moved & (t > t_escape)) | stuck
            paused = paused | newly_paused
            resume = resume & ~adv_resume
        t_ref[:] = t
        steps_ref[:] = steps
        done_ref[:] = done.astype(jnp.int32)
        paused_ref[:] = paused.astype(jnp.int32)
        resume_ref[:] = resume.astype(jnp.int32)
        if relaxed:
            rprev_ref[:] = rprev
            oon_ref[:] = oon.astype(jnp.int32)
        else:
            rprev_ref[:] = t_prev

    def body(carry):
        for p in parts:
            done_ref = p["scratch"][2]
            pl.when(jnp.any(done_ref[:] == 0))(
                functools.partial(section, p))
        alive = jnp.bool_(False)
        for p in parts:
            alive = alive | jnp.any(p["scratch"][2][:] == 0)
        return alive

    def alive0():
        alive = jnp.bool_(False)
        for p in parts:
            alive = alive | jnp.any(p["scratch"][2][:] == 0)
        return alive

    jax.lax.while_loop(lambda c: c, body, alive0())
    occluded = killed_ref[:] != 0
    # Conservative occlusion on budget exhaustion, POST-loop — the exact
    # per-part analog of the sequential marcher's capped output
    # (_march_sdf_part: gate & steps >= budget & no hit), so
    # merged == sequential stays bit-equal under the capped=>occluded
    # rule (test_merged_shadow). Evaluating after the joint loop (rather
    # than accumulating budget-retire events inside it) matters: the
    # sequential formula also counts lanes whose FINAL step escaped or
    # went sub-ulp-stuck at exactly the budget boundary, which an
    # in-loop out-of-steps accumulator misses — 8/9216 builtin pixels
    # flipped on exactly those lanes (DEVNOTES round-5). steps >= budget
    # alone suffices (no thit clause — the merged banks track hits in
    # killed_ref, thit is unwritten): a lane whose final step CROSSED is
    # occluded via its witness either way, and escape-/stuck-at-budget
    # lanes match the sequential capped formula exactly.
    for p in parts:
        cap = p.get("cap_occludes", False)
        if cap is False:
            continue
        gate = p["gate"] & ~killed0
        capped = gate & (p["scratch"][1][:] >= p["budget"])
        if cap is not True:
            capped = capped & cap
        occluded = occluded | capped
    return occluded


def _march_metaballs_part(o: V3, d: V3, gate, t_max, balls, scratch, unroll=None,
                          max_steps=METABALL_MAX_STEPS,
                          step_div=METABALL_MAX_STEPS):
    """Fixed-step isosurface march (VolumetricPrimitives.hlsli:151-202)
    over one tile, ref-state form with the 6-eval facing check under
    pl.when (see _march_sdf). balls: tuple of 3 (cx, cy, cz, r) scalar
    tuples.

    step_div fixes the step SIZE divisor at the reference's 128 even when
    max_steps is a smaller phase budget — a budgeted march must be a strict
    prefix of the full march, not a coarser one."""
    if unroll is None:
        unroll = UNROLL_MB
    # Trailing pair (relax carries) is SDF-only — unused here.
    t_ref, steps_ref, done_ref, paused_ref, resume_ref, thit_ref = scratch[:6]
    inf = jnp.float32(jnp.inf)
    zero = o.x * 0.0

    def potential(p: V3):
        total = p.x * 0.0
        for cx, cy, cz, r in balls:
            total = total + soa.metaball_potential_soa(p, cx, cy, cz, r)
        return total

    # Bounding-sphere interval union clipped per-sphere to [0, t_max]
    # (hlsli:124-147 + AnalyticPrimitives solid-sphere clip).
    tmin = zero + inf
    tmax_u = zero - inf
    for cx, cy, cz, r in balls:
        has, t0, t1 = soa.solve_sphere(o, d, cx, cy, cz, r)
        tmin = jnp.where(has, jnp.minimum(jnp.maximum(t0, 0.0), tmin), tmin)
        tmax_u = jnp.where(has, jnp.maximum(jnp.minimum(t1, t_max), tmax_u), tmax_u)
    tmin = jnp.maximum(tmin, 0.0)
    tmax_u = jnp.minimum(tmax_u, t_max)
    step = (tmax_u - tmin) / float(step_div)

    izero = zero.astype(jnp.int32)
    # Lanes whose ray misses every bounding sphere have an empty interval
    # (tmin=+inf, tmax=-inf); the reference still burns its 128 iterations
    # on them (positions at inf, potential 0 — a hit is impossible), so
    # skipping them immediately is result-identical and saves the march.
    live = gate & (tmax_u >= tmin)

    # Closest-approach potential bound: the quintic falloff is monotone
    # decreasing in distance, so each ball's potential along the marched
    # segment [tmin, tmax_u] is maximized at its closest approach t*
    # clamped to the segment; the sum of those maxima bounds the total
    # potential at EVERY sample. Below the iso threshold no march step
    # can cross — miss without marching. About half of
    # bounding-sphere-crossing lanes bound out (iso 0.25 is reached only
    # within ~0.68 of a ball radius). The epsilon absorbs float32 rounding
    # in the 3-term potential sum: a lane whose true maximum sits within
    # rounding error of the threshold marches rather than being culled
    # (the real-analysis bound is exact; the float evaluation of it is
    # not, so the margin keeps the cull strictly conservative).
    dd = d.dot(d)
    bound = zero
    for cx, cy, cz, r in balls:
        lx, ly, lz = cx - o.x, cy - o.y, cz - o.z
        t_star = (d.x * lx + d.y * ly + d.z * lz) / jnp.maximum(dd, 1e-30)
        t_star = jnp.clip(t_star, tmin, tmax_u)
        p_star = V3(o.x + t_star * d.x, o.y + t_star * d.y,
                    o.z + t_star * d.z)
        bound = bound + soa.metaball_potential_soa(p_star, cx, cy, cz, r)
    live = live & (bound >= METABALL_ISO_THRESHOLD - 1e-5)

    t_ref[:] = tmin
    steps_ref[:] = izero
    done_ref[:] = jnp.where(live, izero, izero + 1)
    paused_ref[:] = izero
    resume_ref[:] = izero
    thit_ref[:] = zero + inf

    def check():
        t = t_ref[:]
        paused = paused_ref[:] != 0
        pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
        n = _metaball_normal(pos, balls)
        facing_ok = d.dot(n) <= 0.0
        in_range = (t >= 0.0) & (t <= t_max)
        valid = paused & facing_ok & in_range
        thit_ref[:] = jnp.where(valid, t, thit_ref[:])
        done_ref[:] = done_ref[:] | valid.astype(jnp.int32)
        resume_ref[:] = (paused & ~valid).astype(jnp.int32)
        paused_ref[:] = izero

    def cond(carry):
        return carry

    def body(carry):
        pl.when(jnp.any(paused_ref[:] != 0))(check)
        t = t_ref[:]
        steps = steps_ref[:]
        done = done_ref[:] != 0
        paused = paused_ref[:] != 0
        resume = resume_ref[:] != 0
        for _ in range(unroll):
            marching = ~done & ~paused
            pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
            total = potential(pos)
            adv_resume = marching & resume
            fresh = marching & ~resume & (steps < max_steps)
            done = done | (marching & ~resume & (steps >= max_steps))
            crossed = total >= METABALL_ISO_THRESHOLD
            newly_paused = fresh & crossed
            advance = fresh & ~crossed
            steps = steps + jnp.where(fresh, 1, 0)
            t = jnp.where(adv_resume | advance, t + step, t)
            paused = paused | newly_paused
            resume = resume & ~adv_resume
        t_ref[:] = t
        steps_ref[:] = steps
        done_ref[:] = done.astype(jnp.int32)
        paused_ref[:] = paused.astype(jnp.int32)
        resume_ref[:] = resume.astype(jnp.int32)
        return jnp.any(~done)

    jax.lax.while_loop(cond, body, jnp.any(done_ref[:] == 0))
    t_hit = thit_ref[:]
    # Normal deferred to the kernel epilogue (see _march_sdf).
    capped = live & (steps_ref[:] >= max_steps) & (t_hit == jnp.inf)
    return t_hit < inf, t_hit, capped


def _march_sdf_inline(distance_fn, o: V3, d: V3, gate, t_max, step_scale,
                      unroll=8, max_steps=SDF_MAX_STEPS, cull_backface=True,
                      t_start=None, escape_bound=True, relax=1.0):
    """Direct transcription of RaySignedDistancePrimitiveTest
    (SignedDistancePrimitives.hlsli:287-319): the validity check (4-eval
    tetrahedral normal + cull + range) runs INLINE at every step, so
    invalid-crossing "crawl" lanes advance every micro-step instead of one
    step per while iteration. 5 distance evals per micro-step for the whole
    tile — used only for the dirty-tile finisher pass where crawl lanes
    dominate (the two-phase marcher is cheaper everywhere else)."""
    inf = jnp.float32(jnp.inf)
    zero = o.x * 0.0
    izero = zero.astype(jnp.int32)
    from gpuraytracer_tpu.geometry.sdf import march_escape_t

    if escape_bound:
        t_escape = jnp.minimum(t_max, march_escape_t(o.length(), d.length()))
    else:
        t_escape = t_max
    t0 = zero if t_start is None else zero + t_start
    relaxed = relax > 1.0
    state0 = (t0, izero, jnp.where(gate, izero, izero + 1), zero + inf)
    if relaxed:
        state0 = state0 + (zero, izero + 1)
    else:
        state0 = state0 + (zero - 1.0,)  # t_prev for cycle retirement

    def cond(state):
        return jnp.any(state[2] == 0)

    def body(state):
        if relaxed:
            t, steps, done_i, t_hit, rprev, oon_i = state
            oon = oon_i != 0
        else:
            t, steps, done_i, t_hit, t_prev = state
        done = done_i != 0
        for _ in range(unroll):
            marching = ~done
            pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
            dist = distance_fn(pos)
            if relaxed:
                fail = marching & oon & (dist + rprev < relax * rprev)
                crossed = (dist <= SDF_HIT_THRESHOLD * t) & ~fail
            else:
                crossed = dist <= SDF_HIT_THRESHOLD * t
            n = _normal_at(distance_fn, pos)
            facing_ok = (d.dot(n) <= 0.0) if cull_backface else (t == t)
            in_range = (t >= 0.0) & (t <= t_max)
            valid = marching & crossed & facing_ok & in_range
            t_hit = jnp.where(valid, t, t_hit)
            done = done | valid
            move = marching & ~valid
            if relaxed:
                # Invalid crossings mirror the pause/check form's resume:
                # plain step, relaxation off for the lane from then on.
                invalid_cross = marching & crossed & ~valid
                plain = step_scale * dist
                fail_step = ((1.0 - relax) * relax) * (step_scale * rprev)
                stepv = jnp.where(
                    fail, fail_step,
                    jnp.where(oon & ~invalid_cross, relax * plain, plain),
                )
                # Escape retire excludes failed-overshoot lanes — a
                # skipped crossing may lie BEHIND the sample; they
                # back-step instead (see sdf.sphere_trace).
                done = done | (move & ~fail & (t + plain > t_escape))
                # Sub-ulp cycle retirement (see _march_sdf_part's
                # relaxed branch): non-fail advances that leave t
                # unchanged repeat forever.
                done = done | (move & ~fail & (t + stepv == t))
                t = jnp.where(move, t + stepv, t)
                oon = oon & ~fail & ~invalid_cross
                rprev = jnp.where(move, dist, rprev)
                steps = steps + jnp.where(marching, 1, 0)
                done = done | (marching & (steps >= max_steps))
            else:
                t_new = t + step_scale * dist
                # Exact cycle retirement — see _march_sdf_part.
                stuck = move & ((t_new == t) | (t_new == t_prev))
                t_prev = jnp.where(move, t, t_prev)
                t = jnp.where(move, t_new, t)
                steps = steps + jnp.where(marching, 1, 0)
                done = done | stuck | (
                    marching & ((steps >= max_steps) | (t > t_escape))
                )
        if relaxed:
            return (t, steps, done.astype(jnp.int32), t_hit, rprev,
                    oon.astype(jnp.int32))
        return t, steps, done.astype(jnp.int32), t_hit, t_prev

    final = jax.lax.while_loop(cond, body, state0)
    t_hit = final[3]
    # Budget-exhausted lanes (same definition as _march_sdf_part's capped
    # output): meaningful when max_steps is a reduced budget.
    capped = gate & (final[1] >= max_steps) & (t_hit == inf)
    return t_hit < inf, t_hit, capped


def _march_metaballs_inline(o: V3, d: V3, gate, t_max, balls, unroll=8,
                            max_steps=METABALL_MAX_STEPS):
    """Inline-check metaball march (VolumetricPrimitives.hlsli:151-202
    transcription) for the dirty-tile finisher — see _march_sdf_inline."""
    inf = jnp.float32(jnp.inf)
    zero = o.x * 0.0

    def potential(p: V3):
        total = p.x * 0.0
        for cx, cy, cz, r in balls:
            total = total + soa.metaball_potential_soa(p, cx, cy, cz, r)
        return total

    tmin = zero + inf
    tmax_u = zero - inf
    for cx, cy, cz, r in balls:
        has, t0, t1 = soa.solve_sphere(o, d, cx, cy, cz, r)
        tmin = jnp.where(has, jnp.minimum(jnp.maximum(t0, 0.0), tmin), tmin)
        tmax_u = jnp.where(has, jnp.maximum(jnp.minimum(t1, t_max), tmax_u), tmax_u)
    tmin = jnp.maximum(tmin, 0.0)
    tmax_u = jnp.minimum(tmax_u, t_max)
    step = (tmax_u - tmin) / float(max_steps)

    izero = zero.astype(jnp.int32)
    live = gate & (tmax_u >= tmin)
    state0 = (tmin, izero, jnp.where(live, izero, izero + 1), zero + inf)

    def cond(state):
        _, _, done_i, _ = state
        return jnp.any(done_i == 0)

    def body(state):
        t, steps, done_i, t_hit = state
        done = done_i != 0
        for _ in range(unroll):
            marching = ~done
            pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)
            total = potential(pos)
            crossed = total >= METABALL_ISO_THRESHOLD
            n = _metaball_normal(pos, balls)
            facing_ok = d.dot(n) <= 0.0
            in_range = (t >= 0.0) & (t <= t_max)
            valid = marching & crossed & facing_ok & in_range
            t_hit = jnp.where(valid, t, t_hit)
            done = done | valid
            move = marching & ~valid
            t = jnp.where(move, t + step, t)
            steps = steps + jnp.where(marching, 1, 0)
            done = done | (marching & (steps >= max_steps))
        return t, steps, done.astype(jnp.int32), t_hit

    _, _, _, t_hit = jax.lax.while_loop(cond, body, state0)
    return t_hit < inf, t_hit


def _metaball_normal(p: V3, balls) -> V3:
    def potential(q: V3):
        total = q.x * 0.0
        for cx, cy, cz, r in balls:
            total = total + soa.metaball_potential_soa(q, cx, cy, cz, r)
        return total

    e = _MB_NORMAL_EPS
    return V3(
        potential(V3(p.x - e, p.y, p.z)) - potential(V3(p.x + e, p.y, p.z)),
        potential(V3(p.x, p.y - e, p.z)) - potential(V3(p.x, p.y + e, p.z)),
        potential(V3(p.x, p.y, p.z - e)) - potential(V3(p.x, p.y, p.z + e)),
    ).normalized()


def _dirty_bit(g: int) -> int:
    """Geometry -> dirty-mask bit. Geometries past 31 share bit 31 (their
    finisher re-marches all of them for lanes with that bit — correct,
    just coarser)."""
    return min(g, 31)


def _local_ray(b2l_ref, g, o: V3, d: V3):
    """BLAS -> unit-AABB local space (Raytracing.hlsl:277-287), matrix rows
    as SMEM scalars."""
    def row(r, vx, vy, vz, w=None):
        out = (
            b2l_ref[g, 4 * r + 0] * vx
            + b2l_ref[g, 4 * r + 1] * vy
            + b2l_ref[g, 4 * r + 2] * vz
        )
        if w is not None:
            out = out + b2l_ref[g, 4 * r + 3]
        return out

    o_loc = V3(row(0, o.x, o.y, o.z, 1), row(1, o.x, o.y, o.z, 1),
               row(2, o.x, o.y, o.z, 1))
    d_loc = V3(row(0, d.x, d.y, d.z), row(1, d.x, d.y, d.z),
               row(2, d.x, d.y, d.z))
    return o_loc, d_loc


def _finish_tile(
    geoms, step_budgets, cull_backface, accept_first,
    o, d, active, dirty_ref, b2l_ref, l2b_ref, sscale_ref, aabb_ref, mb_ref,
    thit_ref, nx_ref, ny_ref, nz_ref, gid_ref, upd_ref,
):
    """Pass 2 of the two-phase scheme: re-march ONLY (lane, geometry) pairs
    whose pass-1 march capped at the phase budget, at full budgets, with
    the inline-check marchers (crawl lanes advance every micro-step).
    Outputs arrive pre-seeded with pass-1 results; t_max = current best_t
    prunes exactly. upd_ref tracks lanes whose winner changed so the
    normal epilogue only recomputes those."""
    dirty_bits = dirty_ref[:]

    for g, (kind, code) in enumerate(geoms):
        if kind not in (
            int(IntersectorKind.SIGNED_DISTANCE),
            int(IntersectorKind.VOLUMETRIC),
        ):
            continue
        lane_dirty = ((dirty_bits >> _dirty_bit(g)) & 1) != 0
        gate0 = lane_dirty & active
        if accept_first:
            gate0 = gate0 & (gid_ref[:] < 0)

        def process(g=g, kind=kind, code=code, gate0=gate0):
            best_t = thit_ref[:]
            tmin_g, tmax_g = soa.aabb_interval(
                o, d,
                aabb_ref[g, 0], aabb_ref[g, 1], aabb_ref[g, 2],
                aabb_ref[g, 3], aabb_ref[g, 4], aabb_ref[g, 5],
            )
            gate = gate0 & (tmax_g > tmin_g) & (tmax_g >= 0.0) & (tmin_g <= best_t)
            o_loc, d_loc = _local_ray(b2l_ref, g, o, d)
            cull_g = cull_backface and not (
                kind == int(IntersectorKind.SIGNED_DISTANCE) and int(code) >= 7
            )
            if kind == int(IntersectorKind.SIGNED_DISTANCE):
                if int(code) >= 7:
                    # AABB-windowed extension semantics (see _traverse_tile).
                    t_lo = jnp.maximum(tmin_g, 0.0)
                    t_hi = jnp.minimum(best_t, tmax_g)
                else:
                    t_lo = None
                    t_hi = best_t
                from gpuraytracer_tpu.geometry import sdf as sdf_mod

                repair_budget = (
                    sdf_mod.cap_occlusion_budget(step_budgets[g])
                    if accept_first
                    else sdf_mod.cap_radiance_budget(step_budgets[g])
                )
                hit, t, capped = _march_sdf_inline(
                    soa.DISTANCE_FUNCTIONS_SOA[int(code)], o_loc, d_loc, gate,
                    t_hi, sscale_ref[g, 0], cull_backface=cull_g,
                    max_steps=repair_budget,
                    t_start=t_lo,
                    escape_bound=int(code) in sdf_mod.ESCAPE_SAFE_CODES,
                    relax=sdf_mod.relax_for_code(int(code),
                                                 occlusion=accept_first),
                )
                if accept_first and repair_budget < step_budgets[g]:
                    # Conservative occlusion on budget exhaustion at the
                    # plain budget (see _traverse_tile's occ_flag rule).
                    hit = hit | capped
                    t = jnp.where(capped, 0.0, t)
            else:
                balls = tuple(
                    (mb_ref[j, 0], mb_ref[j, 1], mb_ref[j, 2], mb_ref[j, 3])
                    for j in range(3)
                )
                hit, t = _march_metaballs_inline(o_loc, d_loc, gate, best_t, balls)

            closer = hit & gate & (t < best_t)
            new_t = jnp.where(closer, t, best_t)
            if accept_first:
                new_gid = jnp.where(closer, g, gid_ref[:])
                thit_ref[:] = jnp.where(new_gid >= 0, 0.0, new_t)
                gid_ref[:] = new_gid
            else:
                thit_ref[:] = new_t
                gid_ref[:] = jnp.where(closer, g, gid_ref[:])
                upd_ref[:] = upd_ref[:] | closer.astype(jnp.int32)

        pl.when(jnp.any(gate0))(process)

    # Normal epilogue: only lanes whose winner changed in this pass.
    if not accept_first:
        best_t = thit_ref[:]
        best_id = gid_ref[:]
        updated = upd_ref[:] != 0
        for g, (kind, code) in enumerate(geoms):
            if kind not in (
                int(IntersectorKind.SIGNED_DISTANCE),
                int(IntersectorKind.VOLUMETRIC),
            ):
                continue
            won = (best_id == g) & updated

            def epilogue(g=g, kind=kind, code=code, won=won):
                o_loc, d_loc = _local_ray(b2l_ref, g, o, d)
                t_won = jnp.where(won, best_t, 0.0)
                pos = V3(
                    o_loc.x + t_won * d_loc.x,
                    o_loc.y + t_won * d_loc.y,
                    o_loc.z + t_won * d_loc.z,
                )
                if kind == int(IntersectorKind.SIGNED_DISTANCE):
                    n_loc = _normal_at(soa.DISTANCE_FUNCTIONS_SOA[int(code)], pos)
                else:
                    balls = tuple(
                        (mb_ref[j, 0], mb_ref[j, 1], mb_ref[j, 2], mb_ref[j, 3])
                        for j in range(3)
                    )
                    n_loc = _metaball_normal(pos, balls)
                nwx = l2b_ref[g, 0] * n_loc.x + l2b_ref[g, 1] * n_loc.y + l2b_ref[g, 2] * n_loc.z
                nwy = l2b_ref[g, 3] * n_loc.x + l2b_ref[g, 4] * n_loc.y + l2b_ref[g, 5] * n_loc.z
                nwz = l2b_ref[g, 6] * n_loc.x + l2b_ref[g, 7] * n_loc.y + l2b_ref[g, 8] * n_loc.z
                inv = 1.0 / jnp.sqrt(jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz, 1e-30))
                nx_ref[:] = jnp.where(won, nwx * inv, nx_ref[:])
                ny_ref[:] = jnp.where(won, nwy * inv, ny_ref[:])
                nz_ref[:] = jnp.where(won, nwz * inv, nz_ref[:])

            pl.when(jnp.any(won))(epilogue)


def _scene_kernel(
    geoms: Tuple[Tuple[int, int], ...],
    clusters: Tuple[Tuple[int, ...], ...],
    step_budgets: Tuple[int, ...],
    cull_backface: bool,
    accept_first: bool,
    order: Tuple[int, ...] | None,
    phase: str,  # "single" | "main" | "finish" (two-phase dirty-tile scheme)
    tri_offsets: Tuple[Tuple[int, int], ...] | None,
    has_level: bool,
    # refs — layout depends on phase:
    #   single: 8 ray planes, 5 SMEM tables [+ tri SMEM] [+ level SMEM],
    #           5 outputs
    #   main:   8 ray planes, 5 SMEM tables [+ tri] [+ level], 5 outputs
    #           + dirty out
    #   finish: 8 ray planes, 5 SMEM tables [+ tri] [+ level], dirty + 5
    #           pass-1 planes, 5 outs
    *refs,
):
    (ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref,
     active_ref, t0_ref, b2l_ref, l2b_ref, sscale_ref, aabb_ref, mb_ref,
     *rest) = refs
    tri_ref = None
    if tri_offsets is not None:
        tri_ref, *rest = rest
    lvl_ref = None
    if has_level:
        lvl_ref, *rest = rest
    # March-state scratch (see _march_sdf) is the trailing 8 refs of every
    # phase layout.
    march_scratch = tuple(rest[-8:])
    rest = rest[:-8]
    if phase == "finish":
        (dirty_ref, p_thit_ref, p_nx_ref, p_ny_ref, p_nz_ref, p_gid_ref,
         thit_ref, nx_ref, ny_ref, nz_ref, gid_ref, _upd_scratch) = rest
    elif phase == "main":
        thit_ref, nx_ref, ny_ref, nz_ref, gid_ref, dirty_ref = rest
    else:
        thit_ref, nx_ref, ny_ref, nz_ref, gid_ref = rest
        dirty_ref = None

    o = V3(ox_ref[:], oy_ref[:], oz_ref[:])
    d = V3(dx_ref[:], dy_ref[:], dz_ref[:])
    active = active_ref[:] != 0
    zero = o.x * 0.0

    if phase == "finish":
        # Carry pass-1 results; re-march ONLY the (lane, geometry) pairs
        # whose budgeted march capped (per-geometry bits in the dirty
        # mask), seeded with pass-1's final best_t (pruning-exact: a hit
        # beyond an already-confirmed closer hit cannot win).
        upd_ref = rest[-1]  # scratch: lanes whose winner changed in pass 2
        thit_ref[:] = p_thit_ref[:]
        nx_ref[:] = p_nx_ref[:]
        ny_ref[:] = p_ny_ref[:]
        nz_ref[:] = p_nz_ref[:]
        gid_ref[:] = p_gid_ref[:]
        upd_ref[:] = zero.astype(jnp.int32)
        tile_dirty = jnp.any(dirty_ref[:] != 0)

        def finish_tile():
            _finish_tile(
                geoms, step_budgets, cull_backface, accept_first,
                o, d, active, dirty_ref, b2l_ref, l2b_ref, sscale_ref,
                aabb_ref, mb_ref, thit_ref, nx_ref, ny_ref, nz_ref, gid_ref,
                upd_ref,
            )

        pl.when(tile_dirty)(finish_tile)
        return

    if phase == "main":
        dirty_ref[:] = zero.astype(jnp.int32)

    _traverse_tile(
        geoms, clusters, step_budgets, cull_backface, accept_first, phase,
        o, d, active, t0_ref[:], b2l_ref, l2b_ref, sscale_ref, aabb_ref, mb_ref,
        thit_ref, nx_ref, ny_ref, nz_ref, gid_ref, dirty_ref, march_scratch,
        order=order, tri_ref=tri_ref, tri_offsets=tri_offsets,
        level=lvl_ref[0, 0] if lvl_ref is not None else None,
    )


# Chunk width of the STREAMED (count > TRI_FACE_CAP) mesh path: each
# fori_loop iteration unrolls this many faces with a traced SMEM base
# index, so Mosaic code size stays one-chunk-sized regardless of count.
TRI_STREAM_CHUNK = 64


def _mt_face(o: V3, d: V3, t_max, tri_ref, f, cull_backface, state):
    """One Möller–Trumbore face test + closest reduction step. `f` may be
    a static int (unrolled small-mesh path) or a traced scalar (streamed
    path) — SMEM scalar reads accept both; the float math is identical, so
    the two paths agree bit-for-bit on the same face set."""
    best_t, nx, ny, nz = state
    zero = o.x * 0.0
    v0x, v0y, v0z = tri_ref[f, 0], tri_ref[f, 1], tri_ref[f, 2]
    e1x, e1y, e1z = tri_ref[f, 3], tri_ref[f, 4], tri_ref[f, 5]
    e2x, e2y, e2z = tri_ref[f, 6], tri_ref[f, 7], tri_ref[f, 8]
    # pv = d x e2
    pvx = d.y * e2z - d.z * e2y
    pvy = d.z * e2x - d.x * e2z
    pvz = d.x * e2y - d.y * e2x
    det = e1x * pvx + e1y * pvy + e1z * pvz
    # det > 0 is the DXR back-face cull branch (trimesh._mt_face).
    det_ok = (det > 1e-12) if cull_backface else (jnp.abs(det) > 1e-12)
    inv = 1.0 / jnp.where(det_ok, det, 1.0)
    tvx, tvy, tvz = o.x - v0x, o.y - v0y, o.z - v0z
    u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
    # qv = tv x e1
    qvx = tvy * e1z - tvz * e1y
    qvy = tvz * e1x - tvx * e1z
    qvz = tvx * e1y - tvy * e1x
    v = (d.x * qvx + d.y * qvy + d.z * qvz) * inv
    t = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
    hit = (
        det_ok & (u >= 0.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t >= 0.0) & (t <= t_max)
    )
    closer = hit & (t < best_t)
    best_t = jnp.where(closer, t, best_t)
    nx = jnp.where(closer, zero + tri_ref[f, 9], nx)
    ny = jnp.where(closer, zero + tri_ref[f, 10], ny)
    nz = jnp.where(closer, zero + tri_ref[f, 11], nz)
    return best_t, nx, ny, nz


def _intersect_trimesh_tile(o: V3, d: V3, t_max, tri_ref, start, count,
                            cull_backface):
    """Möller–Trumbore over `count` SMEM face rows (v0, e1, e2, n —
    geometry/trimesh.py layout) for one tile. The triangle-BLAS analog
    (the reference takes arbitrary meshes, Renderer.cpp:575-592;
    closest-hit Raytracing.hlsl:171-218): faces ride SMEM scalars,
    intersection is branchless dense vector math, the flat shading normal
    comes from the winning face's SMEM row.

    Small meshes (count <= TRI_FACE_CAP) unroll every face statically —
    bit-compatible with the original path. Larger meshes STREAM: a
    fori_loop walks TRI_STREAM_CHUNK-face chunks with a traced SMEM base
    index (pack_tri_rows pads each big mesh to a chunk multiple with
    degenerate all-zero faces, whose det == 0 can never hit), so code
    size — the Mosaic binding constraint (DEVNOTES round-3) — stays
    constant in the face count. Measured SMEM ceiling: a (1024, 12) f32
    table compiles and runs; 2048 rows fails Mosaic, hence
    traverse.TRI_FACE_TOTAL_CAP."""
    from gpuraytracer_tpu.accel.traverse import TRI_FACE_CAP

    inf = jnp.float32(jnp.inf)
    zero = o.x * 0.0
    state = (zero + inf, zero, zero, zero)
    if count <= TRI_FACE_CAP:
        for f in range(start, start + count):
            state = _mt_face(o, d, t_max, tri_ref, f, cull_backface, state)
    else:
        assert count % TRI_STREAM_CHUNK == 0, (
            "pack_tri_rows pads streamed meshes to a chunk multiple")

        def chunk(c, state):
            base = start + c * TRI_STREAM_CHUNK
            for f0 in range(TRI_STREAM_CHUNK):
                state = _mt_face(o, d, t_max, tri_ref, base + f0,
                                 cull_backface, state)
            return state

        state = jax.lax.fori_loop(0, count // TRI_STREAM_CHUNK, chunk, state)
    best_t, nx, ny, nz = state
    return best_t < inf, best_t, V3(nx, ny, nz)


def _traverse_tile(
    geoms, clusters, step_budgets, cull_backface, accept_first, phase,
    o, d, active, t0, b2l_ref, l2b_ref, sscale_ref, aabb_ref, mb_ref,
    thit_ref, nx_ref, ny_ref, nz_ref, gid_ref, dirty_ref, march_scratch,
    order=None, budget_cap=None, mb_budget_cap=None,
    tri_ref=None, tri_offsets=None, kill_on_cap=False, level=None,
):
    # Closest-hit state lives in the OUTPUT refs so each geometry's entire
    # body (local transform + intersector + reduction) can sit under a
    # pl.when tile predicate: a tile whose slab gate admits no lane skips
    # that geometry's code outright (only the ~40-flop slab test runs
    # unconditionally). t0 is the initial upper bound VALUE (plane hit t or
    # RAY_TMAX) — the fused frame kernel computes it in-register.
    zero = o.x * 0.0
    thit_ref[:] = t0
    nx_ref[:] = zero
    ny_ref[:] = zero
    nz_ref[:] = zero
    gid_ref[:] = zero.astype(jnp.int32) - 1

    def geometry_gate(g):
        # In-kernel slab gate against this geometry's BLAS-space AABB,
        # bounded by the tile's current best_t (shrinking RayTCurrent).
        tmin_g, tmax_g = soa.aabb_interval(
            o, d,
            aabb_ref[g, 0], aabb_ref[g, 1], aabb_ref[g, 2],
            aabb_ref[g, 3], aabb_ref[g, 4], aabb_ref[g, 5],
        )
        gate = (
            (tmax_g > tmin_g) & (tmax_g >= 0.0) & (tmin_g <= thit_ref[:]) & active
        )
        if accept_first:
            # The zeroed best_t bound (see the accept-first update) rejects
            # accepted lanes only when the next box is AHEAD (tmin_g > 0).
            # Occlusion origins sit ON scene surfaces — often inside a
            # later geometry's AABB (tmin_g < 0), where the bound is
            # toothless and the accepted lane would march again for
            # nothing. Excluding accepted lanes is result-exact: the
            # accept-first update never replaces a found occluder.
            gate = gate & (gid_ref[:] < 0)
        if dirty_ref is not None and kill_on_cap:
            # Kill-on-cap: a lane with ANY capped march is already doomed
            # to a full dense-pass recompute (render_frame_compact), so
            # marching it further is pure waste — worse, its missing
            # best_t leaves every later gate open (measured: capping all
            # budgets at 64 was SLOWER than full budgets, 62.4 vs 57.3 ms,
            # purely from this effect).
            gate = gate & (dirty_ref[:] == 0)
        return gate, tmin_g, tmax_g

    def geometry_body(g, kind, code, gate, tmin_g, tmax_g):
        # Extension DE fractals (codes past the reference's 0..6) skip the
        # back-face cull: their rough boundaries make the tetrahedral
        # normal noisy, turning the cull check into a resume-crawl. The
        # reference primitives keep exact cull parity.
        cull_g = cull_backface and not (
            kind == int(IntersectorKind.SIGNED_DISTANCE) and int(code) >= 7
        )

        def process(g=g, kind=kind, code=code, cull_g=cull_g, gate=gate):
            best_t = thit_ref[:]

            # BLAS -> unit-AABB local space (Raytracing.hlsl:277-287),
            # matrix rows as SMEM scalars.
            def row(ref, r, vx, vy, vz, w=None):
                out = (
                    ref[g, 4 * r + 0] * vx
                    + ref[g, 4 * r + 1] * vy
                    + ref[g, 4 * r + 2] * vz
                )
                if w is not None:
                    out = out + ref[g, 4 * r + 3]
                return out

            o_loc = V3(
                row(b2l_ref, 0, o.x, o.y, o.z, w=1),
                row(b2l_ref, 1, o.x, o.y, o.z, w=1),
                row(b2l_ref, 2, o.x, o.y, o.z, w=1),
            )
            d_loc = V3(
                row(b2l_ref, 0, d.x, d.y, d.z),
                row(b2l_ref, 1, d.x, d.y, d.z),
                row(b2l_ref, 2, d.x, d.y, d.z),
            )

            def world_normal(n_loc):
                # local -> BLAS(-> world, identity rotation) normal,
                # straight-matrix like the reference
                # (Raytracing.hlsl:298-301), then normalize.
                nwx = l2b_ref[g, 0] * n_loc.x + l2b_ref[g, 1] * n_loc.y + l2b_ref[g, 2] * n_loc.z
                nwy = l2b_ref[g, 3] * n_loc.x + l2b_ref[g, 4] * n_loc.y + l2b_ref[g, 5] * n_loc.z
                nwz = l2b_ref[g, 6] * n_loc.x + l2b_ref[g, 7] * n_loc.y + l2b_ref[g, 8] * n_loc.z
                inv = 1.0 / jnp.sqrt(jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz, 1e-30))
                return nwx * inv, nwy * inv, nwz * inv

            if kind == int(IntersectorKind.SIGNED_DISTANCE):
                distance_fn = soa.DISTANCE_FUNCTIONS_SOA[int(code)]
                budget = step_budgets[g]
                if phase == "main":
                    budget = min(PHASE_BUDGET, budget)
                elif budget_cap is not None:
                    budget = min(budget_cap, budget)
                if int(code) >= 7:
                    # Extension DE fractals are DEFINED clipped to their
                    # AABB: the march window is [max(entry, 0),
                    # min(exit, RayTCurrent)] — miss lanes stop at the box
                    # exit instead of the global escape bound, and empty
                    # space before the box costs nothing. (Reference
                    # primitives march from t=0 for parity.)
                    t_lo = jnp.maximum(tmin_g, 0.0)
                    t_hi = jnp.minimum(best_t, tmax_g)
                else:
                    t_lo = None
                    t_hi = best_t
                from gpuraytracer_tpu.geometry import sdf as sdf_mod

                esc = int(code) in sdf_mod.ESCAPE_SAFE_CODES
                relax = sdf_mod.relax_for_code(int(code),
                                               occlusion=accept_first)
                if accept_first:
                    budget = sdf_mod.cap_occlusion_budget(budget)
                    budget_b = sdf_mod.cap_occlusion_budget(budget, bounce=True)
                else:
                    budget = sdf_mod.cap_radiance_budget(budget)
                    budget_b = sdf_mod.cap_radiance_budget(budget, bounce=True)
                # Per-LEVEL budget: bounce-level marches (recursion depth
                # >= 1) take a harsher cap than the primary level — their
                # mis-shade is scaled by the parent reflection's
                # throughput (see sdf.bounce_*_budget_cap). The budget is
                # comparison-only in the march (steps < max_steps), so a
                # TRACED level index selects it by VALUE with zero code
                # growth — the structural per-level specialization the
                # level-unroll couldn't afford (DEVNOTES: 49.2 ms cliff).
                if level is not None and budget_b < budget:
                    if isinstance(level, int):
                        budget_eff = budget if level == 0 else budget_b
                    else:
                        budget_eff = jnp.where(level == 0,
                                               jnp.int32(budget),
                                               jnp.int32(budget_b))
                else:
                    budget_eff = budget
                if accept_first and SHADOW_INLINE:
                    hit, t, capped = _march_sdf_inline(
                        distance_fn, o_loc, d_loc, gate, t_hi,
                        sscale_ref[g, 0], cull_backface=cull_g,
                        max_steps=budget_eff, t_start=t_lo, escape_bound=esc,
                        relax=relax,
                    )
                else:
                    sh_unroll = (UNROLL_SDF_SHADOW or None) if accept_first else None
                    hit, t, capped = _march_sdf(
                        distance_fn, o_loc, d_loc, gate, t_hi,
                        sscale_ref[g, 0], march_scratch[:8], cull_backface=cull_g,
                        max_steps=budget_eff, t_start=t_lo, escape_bound=esc,
                        relax=relax, unroll=sh_unroll,
                    )
                if accept_first:
                    # Conservative occlusion on budget exhaustion
                    # (closest=>occluded, tests/test_properties.py): a
                    # capped occlusion march has not proven light
                    # visibility, so it reports occluded. The rule binds
                    # ONLY at the plain kernel's final budget — a
                    # phase/compact-reduced march keeps reporting lit +
                    # dirty, and its repair pass applies the rule at the
                    # plain budget, so deferred == plain == repaired at
                    # any knob setting (test_defer / test_compact). With
                    # the caps off (plain budget == natural) nothing
                    # triggers: reference miss-on-exhaustion semantics.
                    natural = step_budgets[g]
                    plain0 = sdf_mod.cap_occlusion_budget(natural)
                    plain_b = sdf_mod.cap_occlusion_budget(plain0, bounce=True)
                    occ0 = (budget == plain0) and (plain0 < natural)
                    occb = (budget_b == plain_b) and (plain_b < natural)
                    if level is None or isinstance(level, int):
                        occ_flag = occb if (level or 0) > 0 else occ0
                    elif occ0 == occb:
                        occ_flag = occ0
                    else:
                        occ_flag = jnp.where(level == 0, occ0, occb)
                    if occ_flag is not False:
                        occ_now = capped & occ_flag
                        hit = hit | occ_now
                        t = jnp.where(occ_now, 0.0, t)
                min_budget = budget if level is None else min(budget, budget_b)
                if dirty_ref is not None and min_budget < step_budgets[g]:
                    dirty_ref[:] = dirty_ref[:] | (
                        capped.astype(jnp.int32) << _dirty_bit(g)
                    )
                n_world = None  # normal deferred to the pl.when epilogue
            elif kind == int(IntersectorKind.VOLUMETRIC):
                balls = tuple(
                    (mb_ref[j, 0], mb_ref[j, 1], mb_ref[j, 2], mb_ref[j, 3])
                    for j in range(3)
                )
                budget = METABALL_MAX_STEPS
                if phase == "main":
                    budget = min(PHASE_BUDGET, budget)
                elif mb_budget_cap is not None:
                    budget = min(mb_budget_cap, budget)
                hit, t, capped = _march_metaballs(
                    o_loc, d_loc, gate, best_t, balls, march_scratch[:8],
                    max_steps=budget, step_div=METABALL_MAX_STEPS,
                )
                if dirty_ref is not None and budget < METABALL_MAX_STEPS:
                    dirty_ref[:] = dirty_ref[:] | (
                        capped.astype(jnp.int32) << _dirty_bit(g)
                    )
                n_world = None
            elif kind == int(IntersectorKind.TRIANGLE):
                start, count = tri_offsets[int(code)]
                hit, t, n_loc = _intersect_trimesh_tile(
                    o_loc, d_loc, best_t, tri_ref, start, count,
                    cull_backface,
                )
                # Occlusion queries never read normals; skip the
                # l2b transform + normalize outright.
                n_world = None if accept_first else world_normal(n_loc)
            elif kind == int(IntersectorKind.ANALYTIC) and code == int(AnalyticPrimitive.AABB):
                hit, t, n_loc = soa.intersect_hollow_aabb(
                    o_loc, d_loc, 0.0, best_t, cull_backface
                )
                # Occlusion queries never read normals; skip the
                # l2b transform + normalize outright.
                n_world = None if accept_first else world_normal(n_loc)
            elif kind == int(IntersectorKind.ANALYTIC) and code == int(AnalyticPrimitive.SPHERES):
                hit, t, n_loc = soa.intersect_spheres(
                    o_loc, d_loc, 0.0, best_t, cull_backface
                )
                # Occlusion queries never read normals; skip the
                # l2b transform + normalize outright.
                n_world = None if accept_first else world_normal(n_loc)
            else:
                raise ValueError(f"unsupported geometry kind={kind} code={code}")

            closer = hit & gate & (t < best_t)
            new_t = jnp.where(closer, t, best_t)
            if accept_first:
                # Occlusion-only queries (ACCEPT_FIRST_HIT_AND_END_SEARCH):
                # a hit lane needs no closer answer — zero its bound so
                # every later geometry's gate and march reject it instantly.
                new_gid = jnp.where(closer, g, gid_ref[:])
                thit_ref[:] = jnp.where(new_gid >= 0, 0.0, new_t)
                gid_ref[:] = new_gid
            else:
                thit_ref[:] = new_t
                gid_ref[:] = jnp.where(closer, g, gid_ref[:])
                if n_world is not None:
                    nx_ref[:] = jnp.where(closer, n_world[0], nx_ref[:])
                    ny_ref[:] = jnp.where(closer, n_world[1], ny_ref[:])
                    nz_ref[:] = jnp.where(closer, n_world[2], nz_ref[:])

        process()

    def handle_geometry(g, kind, code):
        gate, tmin_g, tmax_g = geometry_gate(g)
        pl.when(jnp.any(gate))(
            functools.partial(geometry_body, g, kind, code, gate, tmin_g,
                              tmax_g)
        )

    def handle_cheap_run(members):
        # Consecutive closed-form geometries share ONE activity branch
        # (see _CHEAP_KINDS). Gates are evaluated against the run-entry
        # best_t; the per-lane `closer` reduction inside each body reads
        # the fresh best_t, so the stale gate only admits extra lanes that
        # then lose the reduction — result-identical to the per-geometry
        # branches in the same order.
        infos = [(g,) + geometry_gate(g) for g in members]
        union = infos[0][1]
        for _, gate, _, _ in infos[1:]:
            union = union | gate

        def process_run():
            for g, gate, tmin_g, tmax_g in infos:
                kind, code = geoms[g]
                geometry_body(g, kind, code, gate, tmin_g, tmax_g)

        pl.when(jnp.any(union))(process_run)

    def emit_sequence(seq):
        batch = _batch_cheap()
        run = []

        def flush():
            if len(run) == 1:
                handle_geometry(run[0], *geoms[run[0]])
            elif run:
                handle_cheap_run(tuple(run))
            run.clear()

        for g in seq:
            kind, code = geoms[g]
            if batch and kind in _CHEAP_KINDS:
                run.append(g)
                if CHEAP_RUN_MAX and len(run) >= CHEAP_RUN_MAX:
                    flush()
            else:
                flush()
                handle_geometry(g, kind, code)
        flush()

    g_count = len(geoms)
    if order is None:
        order = tuple(range(g_count))
    # Traversal order is free to choose: the closest-hit reduction is a
    # min over all candidates (pruning by the running best_t never
    # discards the winner), and occlusion queries reduce to "any valid
    # hit exists" — both order-independent in their RESULT. So order
    # purely for cost: closed-form geometries first (their bodies cost
    # about as much as their gates, and their hits tighten best_t /
    # zero the accept-first bound before any march while-loop starts),
    # then the interval-bounded metaball march, then the sphere-traced
    # SDFs. Stable within each class, preserving the near-first order
    # between marchers.
    cost_class = {
        int(IntersectorKind.ANALYTIC): 0,
        int(IntersectorKind.TRIANGLE): 0,
        int(IntersectorKind.VOLUMETRIC): 1,
        int(IntersectorKind.SIGNED_DISTANCE): 2,
    }
    if not os.environ.get("GPURT_NO_CHEAP_FIRST"):
        order = tuple(sorted(order, key=lambda g: cost_class[geoms[g][0]]))

    # Merged occlusion march (_march_sdf_multi): pull every SDF geometry
    # out of the sequential emit and run them in ONE shared while loop
    # after the cheap/metaball phase. Engages only on full-budget
    # accept-first traversals with the per-geometry scratch banks
    # allocated (frame kernel plain path); order/cluster structure is
    # irrelevant to the occlusion boolean (any-valid-hit reduction).
    merged_sdf = ()
    if (accept_first and merged_shadow_enabled() and dirty_ref is None
            and budget_cap is None and phase == "single"
            and not SHADOW_INLINE):
        sdf_ids = tuple(
            g for g in order
            if geoms[g][0] == int(IntersectorKind.SIGNED_DISTANCE)
        )
        if (len(sdf_ids) >= 2
                and len(march_scratch) >= 8 + 16 * len(sdf_ids) + 1):
            merged_sdf = sdf_ids
    seq_order = tuple(g for g in order if g not in merged_sdf)
    rank = {g: i for i, g in enumerate(order)}
    if len(clusters) == 1:
        # Flat traversal: one implicit cluster needs no extra gate.
        # Processing near geometries first (layout.traversal_order) lets
        # the shrinking best_t reject far gates before their marches.
        emit_sequence(seq_order)
    else:
        # Two-level traversal (accel/bvh.py): one slab test against the
        # cluster's merged AABB gates ALL member geometry — a tile that
        # misses the cluster pays a single test for the whole group. The
        # tile's shrinking best_t bounds cluster gates exactly like
        # geometry gates (closer cluster hits reject farther clusters).
        cluster_order = sorted(
            range(len(clusters)),
            key=lambda k: min(rank[g] for g in clusters[k]),
        )
        for k in cluster_order:
            members = sorted(
                (g for g in clusters[k] if g not in merged_sdf),
                key=lambda g: rank[g],
            )
            if not members:
                continue
            row = g_count + k
            tmin_c, tmax_c = soa.aabb_interval(
                o, d,
                aabb_ref[row, 0], aabb_ref[row, 1], aabb_ref[row, 2],
                aabb_ref[row, 3], aabb_ref[row, 4], aabb_ref[row, 5],
            )
            gate_c = (
                (tmax_c > tmin_c) & (tmax_c >= 0.0)
                & (tmin_c <= thit_ref[:]) & active
            )

            def process_cluster(members=members):
                emit_sequence(members)

            pl.when(jnp.any(gate_c))(process_cluster)

    if merged_sdf:
        from gpuraytracer_tpu.geometry import sdf as sdf_mod

        n_m = len(merged_sdf)
        banks = [tuple(march_scratch[8 + 16 * k: 8 + 16 * (k + 1)])
                 for k in range(n_m)]
        killed_ref = march_scratch[8 + 16 * n_m]
        parts = []
        for k, g in enumerate(merged_sdf):
            _, code = geoms[g]
            gate_m, tmin_m, _ = geometry_gate(g)
            windowed = int(code) >= 7

            def ray(g=g):
                def mrow(r, vx, vy, vz, w=None):
                    out = (b2l_ref[g, 4 * r + 0] * vx
                           + b2l_ref[g, 4 * r + 1] * vy
                           + b2l_ref[g, 4 * r + 2] * vz)
                    if w is not None:
                        out = out + b2l_ref[g, 4 * r + 3]
                    return out

                o_loc = V3(mrow(0, o.x, o.y, o.z, w=1),
                           mrow(1, o.x, o.y, o.z, w=1),
                           mrow(2, o.x, o.y, o.z, w=1))
                d_loc = V3(mrow(0, d.x, d.y, d.z),
                           mrow(1, d.x, d.y, d.z),
                           mrow(2, d.x, d.y, d.z))
                return o_loc, d_loc

            def t_max(g=g, windowed=windowed):
                bound = thit_ref[:]
                if not windowed:
                    return bound
                _, tmax_w = soa.aabb_interval(
                    o, d,
                    aabb_ref[g, 0], aabb_ref[g, 1], aabb_ref[g, 2],
                    aabb_ref[g, 3], aabb_ref[g, 4], aabb_ref[g, 5],
                )
                return jnp.minimum(bound, tmax_w)

            sb = step_budgets[g] if step_budgets else SDF_MAX_STEPS
            mb = sdf_mod.cap_occlusion_budget(sb)
            mb_b = sdf_mod.cap_occlusion_budget(sb, bounce=True)
            # Per-level budget, selected by VALUE exactly like the
            # sequential marches (the budget is comparison-only in the
            # march loop), so merged == sequential holds at every level.
            if level is None or mb_b >= mb:
                m_budget = mb
            elif isinstance(level, int):
                m_budget = mb if level == 0 else mb_b
            else:
                m_budget = jnp.where(level == 0, jnp.int32(mb),
                                     jnp.int32(mb_b))
            # Conservative occlusion on budget exhaustion — same rule
            # (and level selection) as the sequential marches, so
            # merged == sequential stays bit-exact (test_merged_shadow).
            occ0 = mb < sb
            occb = mb_b < sb
            if level is None or mb_b >= mb:
                m_occ = occ0
            elif isinstance(level, int):
                m_occ = occ0 if level == 0 else occb
            elif occ0 == occb:
                m_occ = occ0
            else:
                m_occ = jnp.where(level == 0, occ0, occb)
            parts.append(dict(
                fn=soa.DISTANCE_FUNCTIONS_SOA[int(code)],
                ray=ray,
                gate=gate_m,
                t_lo=jnp.maximum(tmin_m, 0.0) if windowed else None,
                t_max=t_max,
                budget=m_budget,
                escape=int(code) in sdf_mod.ESCAPE_SAFE_CODES,
                # _march_sdf_multi only ever runs occlusion queries.
                relax=sdf_mod.relax_for_code(int(code), occlusion=True),
                cull=cull_backface and int(code) < 7,
                step_scale=(lambda g=g: sscale_ref[g, 0]),
                scratch=banks[k],
                cap_occludes=m_occ,
            ))
        occluded = _march_sdf_multi(parts, killed_ref, gid_ref[:] >= 0)
        new_gid = jnp.where(occluded & (gid_ref[:] < 0),
                            merged_sdf[0], gid_ref[:])
        gid_ref[:] = new_gid
        thit_ref[:] = jnp.where(new_gid >= 0, 0.0, thit_ref[:])

    best_t = thit_ref[:]
    best_id = gid_ref[:]

    # Normal epilogue for the march geometries: recompute the hit normal
    # ONLY in tiles that geometry actually won (pl.when tile predicate).
    # This is where the unconditional version burned ~4 distance evals per
    # geometry per tile regardless of gating.
    if not accept_first:
        for g, (kind, code) in enumerate(geoms):
            if kind not in (
                int(IntersectorKind.SIGNED_DISTANCE),
                int(IntersectorKind.VOLUMETRIC),
            ):
                continue
            won = best_id == g

            def epilogue(g=g, kind=kind, code=code, won=won):
                def row(ref, r, vx, vy, vz, w=None):
                    out = (
                        ref[g, 4 * r + 0] * vx
                        + ref[g, 4 * r + 1] * vy
                        + ref[g, 4 * r + 2] * vz
                    )
                    if w is not None:
                        out = out + ref[g, 4 * r + 3]
                    return out

                o_loc = V3(
                    row(b2l_ref, 0, o.x, o.y, o.z, w=1),
                    row(b2l_ref, 1, o.x, o.y, o.z, w=1),
                    row(b2l_ref, 2, o.x, o.y, o.z, w=1),
                )
                d_loc = V3(
                    row(b2l_ref, 0, d.x, d.y, d.z),
                    row(b2l_ref, 1, d.x, d.y, d.z),
                    row(b2l_ref, 2, d.x, d.y, d.z),
                )
                t_won = jnp.where(won, best_t, 0.0)
                pos = V3(
                    o_loc.x + t_won * d_loc.x,
                    o_loc.y + t_won * d_loc.y,
                    o_loc.z + t_won * d_loc.z,
                )
                if kind == int(IntersectorKind.SIGNED_DISTANCE):
                    n_loc = _normal_at(soa.DISTANCE_FUNCTIONS_SOA[int(code)], pos)
                else:
                    balls = tuple(
                        (mb_ref[j, 0], mb_ref[j, 1], mb_ref[j, 2], mb_ref[j, 3])
                        for j in range(3)
                    )
                    n_loc = _metaball_normal(pos, balls)
                nwx = l2b_ref[g, 0] * n_loc.x + l2b_ref[g, 1] * n_loc.y + l2b_ref[g, 2] * n_loc.z
                nwy = l2b_ref[g, 3] * n_loc.x + l2b_ref[g, 4] * n_loc.y + l2b_ref[g, 5] * n_loc.z
                nwz = l2b_ref[g, 6] * n_loc.x + l2b_ref[g, 7] * n_loc.y + l2b_ref[g, 8] * n_loc.z
                inv = 1.0 / jnp.sqrt(jnp.maximum(nwx * nwx + nwy * nwy + nwz * nwz, 1e-30))
                nx_ref[:] = jnp.where(won, nwx * inv, nx_ref[:])
                ny_ref[:] = jnp.where(won, nwy * inv, ny_ref[:])
                nz_ref[:] = jnp.where(won, nwz * inv, nz_ref[:])

            pl.when(jnp.any(won))(epilogue)


@functools.partial(jax.jit, static_argnames=("geoms", "clusters", "step_budgets", "cull_backface", "accept_first", "order", "two_phase", "debug_dirty", "interpret", "tri_offsets"))
def scene_closest_tiles(
    o_blas,  # (H, W, 3)
    d_blas,  # (H, W, 3)
    active,  # (H, W) bool
    t0,  # (H, W) f32 — initial upper bound (plane hit t or RAY_TMAX)
    b2l_rows,  # (G, 12) f32
    l2b_rot,  # (G, 9) f32
    step_scales,  # (G,) f32
    aabbs,  # (G, 6) f32
    mb_params,  # (3, 4) f32 (centers + radii; zeros if unused)
    tri_rows=None,  # (F, 12) f32 mesh face rows (v0, e1, e2, n) or None
    *,
    geoms: Tuple[Tuple[int, int], ...],
    clusters: Tuple[Tuple[int, ...], ...] | None = None,
    step_budgets: Tuple[int, ...] | None = None,
    cull_backface: bool = True,
    accept_first: bool = False,
    order: Tuple[int, ...] | None = None,
    two_phase: bool = False,
    debug_dirty: bool = False,
    interpret: bool = False,
    tri_offsets: Tuple[Tuple[int, int], ...] | None = None,  # per mesh slot
    level=None,  # None | int | traced i32 — recursion depth of this pass
):
    """Returns (best_t, normal (H,W,3), geom_id (H,W) int32; -1 where no
    procedural hit beat t0). With accept_first (occlusion queries) only
    geom_id >= 0 is meaningful. debug_dirty additionally returns the pass-1
    per-lane dirty bitmask (diagnostics).

    two_phase: budgeted pass + dirty-tile finisher (see PHASE_BUDGET);
    bit-identical to the single full-budget pass. Default OFF: tiles run
    sequentially on the TensorCore, so a tile-granular finisher re-pays the
    per-tile convoy it tried to avoid — measured 143 ms vs 76 ms at 1080p
    (the dirty tiles it re-marches are exactly the expensive ones, and the
    inline marchers cost ~5 evals/step on legitimately long marches)."""
    h, w = active.shape
    ph = (-h) % TILE_ROWS
    pw = (-w) % TILE_COLS

    def pad2(x, fill):
        if ph or pw:
            x = jnp.pad(x, ((0, ph), (0, pw)), constant_values=fill)
        return x

    planes = [
        pad2(o_blas[..., 0], 0.0), pad2(o_blas[..., 1], 0.0), pad2(o_blas[..., 2], 0.0),
        pad2(d_blas[..., 0], 1.0), pad2(d_blas[..., 1], 0.0), pad2(d_blas[..., 2], 0.0),
        pad2(active.astype(jnp.int32), 0),
        pad2(t0.astype(jnp.float32), 0.0),
    ]
    hp, wp = h + ph, w + pw
    grid = (hp // TILE_ROWS, wp // TILE_COLS)

    tile_spec = pl.BlockSpec((TILE_ROWS, TILE_COLS), lambda i, j: (i, j), memory_space=pltpu.VMEM)

    def smem(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape), memory_space=pltpu.SMEM)

    g = len(geoms)
    if step_budgets is None:
        step_budgets = (SDF_MAX_STEPS,) * g
    if clusters is None:
        clusters = (tuple(range(g)),)
    if len(clusters) > 1:
        # Append the merged cluster AABBs as extra SMEM rows.
        cl_min = jnp.stack(
            [jnp.min(aabbs[list(c), :3], axis=0) for c in clusters]
        )
        cl_max = jnp.stack(
            [jnp.max(aabbs[list(c), 3:], axis=0) for c in clusters]
        )
        aabbs = jnp.concatenate(
            [aabbs, jnp.concatenate([cl_min, cl_max], axis=-1)], axis=0
        )
    # Two-phase pays off only when some march budget exceeds PHASE_BUDGET.
    marchable = any(
        (k == int(IntersectorKind.SIGNED_DISTANCE) and step_budgets[i] > PHASE_BUDGET)
        or (k == int(IntersectorKind.VOLUMETRIC) and METABALL_MAX_STEPS > PHASE_BUDGET)
        for i, (k, _) in enumerate(geoms)
    )
    two_phase = two_phase and marchable

    f32 = jnp.float32
    # Under shard_map the outputs must declare their varying mesh axes;
    # inherit them from the ray planes (empty outside shard_map).
    vma = getattr(jax.typeof(planes[0]), "vma", None)
    kw = {"vma": vma} if vma else {}
    smem_args = (
        b2l_rows.astype(f32),
        l2b_rot.astype(f32),
        step_scales.astype(f32).reshape(g, 1),
        aabbs.astype(f32),
        mb_params.astype(f32),
    )
    smem_specs = [
        smem((g, 12)), smem((g, 9)), smem((g, 1)),
        smem((aabbs.shape[0], 6)), smem((3, 4)),
    ]
    if tri_rows is not None:
        assert tri_offsets is not None
        smem_args = smem_args + (tri_rows.astype(f32),)
        smem_specs = smem_specs + [smem(tuple(tri_rows.shape))]
    if level is not None:
        # Recursion-depth scalar (SMEM): selects the per-LEVEL march
        # budget inside _traverse_tile (bounce levels cap harder — see
        # sdf.bounce_*_budget_cap). Appended only when the caller passes
        # a level so level-less call sites keep their kernel cache keys.
        smem_args = smem_args + (
            jnp.asarray(level, jnp.int32).reshape(1, 1),
        )
        smem_specs = smem_specs + [smem((1, 1))]
    out5 = [
        jax.ShapeDtypeStruct((hp, wp), f32, **kw),
        jax.ShapeDtypeStruct((hp, wp), f32, **kw),
        jax.ShapeDtypeStruct((hp, wp), f32, **kw),
        jax.ShapeDtypeStruct((hp, wp), f32, **kw),
        jax.ShapeDtypeStruct((hp, wp), jnp.int32, **kw),
    ]

    def make_kernel(phase):
        return functools.partial(
            _scene_kernel, tuple(geoms), tuple(clusters), tuple(step_budgets),
            cull_backface, accept_first,
            tuple(order) if order is not None else None, phase,
            tuple(tri_offsets) if tri_rows is not None else None,
            level is not None,
        )

    # March-state scratch (t, steps, done, paused, resume, t_hit, plus the
    # relax carries rprev/omega-on) — see _march_sdf. Shared across all
    # geometries of a tile sequentially.
    march_scratch = [
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.float32),
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.float32),
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.float32),
        pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
    ]

    if not two_phase:
        thit, nx, ny, nz, gid = pl.pallas_call(
            make_kernel("single"),
            grid=grid,
            in_specs=[tile_spec] * 8 + smem_specs,
            out_specs=[tile_spec] * 5,
            out_shape=out5,
            scratch_shapes=march_scratch,
            interpret=interpret,
        )(*planes, *smem_args)
    else:
        i32_out = jax.ShapeDtypeStruct((hp, wp), jnp.int32, **kw)
        thit1, nx1, ny1, nz1, gid1, dirty = pl.pallas_call(
            make_kernel("main"),
            grid=grid,
            in_specs=[tile_spec] * 8 + smem_specs,
            out_specs=[tile_spec] * 6,
            out_shape=out5 + [i32_out],
            scratch_shapes=march_scratch,
            interpret=interpret,
        )(*planes, *smem_args)
        thit, nx, ny, nz, gid = pl.pallas_call(
            make_kernel("finish"),
            grid=grid,
            in_specs=[tile_spec] * 8 + smem_specs + [tile_spec] * 6,
            out_specs=[tile_spec] * 5,
            out_shape=out5,
            scratch_shapes=[
                pltpu.VMEM((TILE_ROWS, TILE_COLS), jnp.int32),
            ] + march_scratch,
            interpret=interpret,
        )(*planes, *smem_args, dirty, thit1, nx1, ny1, nz1, gid1)

    normal = jnp.stack([nx[:h, :w], ny[:h, :w], nz[:h, :w]], axis=-1)
    if debug_dirty:
        d = dirty[:h, :w] if two_phase else jnp.zeros((h, w), jnp.int32)
        return thit[:h, :w], normal, gid[:h, :w], d
    return thit[:h, :w], normal, gid[:h, :w]


def pack_params(arrays, elapsed_time):
    """Build the SMEM parameter blocks from SceneArrays (traced)."""
    from gpuraytracer_tpu.geometry import metaballs as mb

    b2l = arrays.transforms.blas_to_local  # (G, 4, 4) column-convention
    l2b = arrays.transforms.local_to_blas
    g = b2l.shape[0]
    b2l_rows = b2l[:, :3, :].reshape(g, 12)
    l2b_rot = l2b[:, :3, :3].reshape(g, 9)
    aabbs = jnp.concatenate([arrays.aabb_min, arrays.aabb_max], axis=-1)
    centers, radii = mb.animated_metaballs(elapsed_time)
    mb_params = jnp.concatenate([centers, radii[:, None]], axis=-1)  # (3, 4)
    step_scales = arrays.materials.step_scale[:g]
    return b2l_rows, l2b_rot, step_scales, aabbs, mb_params
