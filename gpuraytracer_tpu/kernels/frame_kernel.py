"""Fully fused frame megakernel: the whole DispatchRays in ONE pallas_call.

The pass-based TPU path (render/trace.py + kernels/scene_kernel.py) runs
five traversal kernels per frame (closest at 3 levels + occlusion at 2)
with XLA elementwise glue between them — raygen, hit-point reconstruction,
material fetch, Phong/Fresnel/fog/checkers shading, bounce chaining. Every
boundary materializes ~13 full-image planes to HBM and pays a kernel
launch + per-tile fixed costs again.

This kernel fuses the entire frame per (TILE_ROWS, TILE_COLS) pixel tile:

  raygen (program_id + iota, camera in SMEM)
  -> for level in 0..max_depth-1:          [lax.fori_loop, state in VMEM]
       plane test -> whole-scene traversal (scene_kernel._traverse_tile,
       same marchers, bit-identical hits) -> material select-chain from
       SMEM -> shadow ray + occlusion traversal (accept-first) -> Phong +
       fake AO + checkers + Fresnel + fog -> color/throughput recurrence
       (render/trace.py affine form) -> reflect
  -> write RGBA planes

Zero VMEM inputs: rays are generated in-register, every parameter rides
SMEM. The only HBM traffic for the whole frame is the final image write.

Reference parity: shading formulas are transcribed 1:1 from render/shade.py,
render/checkers.py and render/trace.py (which carry the HLSL anchors:
Raytracing.hlsl:50-80 Phong+AO, :213-215 fog, RaytracingShaderHelper
.hlsli:178-182 Fresnel, :103-120 raygen, :148-175 checkers); ray math uses
the division-form normalize so march inputs stay bit-identical with the
XLA wavefront path (crossing thresholds are ulp-sensitive).
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
    BACKGROUND_COLOR,
    IN_SHADOW_RADIANCE,
    IntersectorKind,
    RAY_TMAX,
    REFLECTANCE_EPS,
)
from gpuraytracer_tpu.kernels import scene_kernel
from gpuraytracer_tpu.kernels.soa import V3

CHECKERS_RATIO = 50.0  # SignedDistancePrimitives.hlsli:174 call site

# Profiling knob: force shadow traversals off (shadow factor = lit) to
# attribute frame cost between occlusion and bounce-closest passes.
# Never enabled on a default path.
PROFILE_NO_SHADOWS = False


def _tw_eps() -> float:
    """Sub-epsilon throughput kill bound (GPURT_TW_EPS, default 0 =
    exact-zero kill only). A lane retired with outgoing throughput
    <= eps on every channel can change the pixel by at most
    eps * base_max * levels_left; with eps = 1e-4, base <= ~4 (Phong +
    specular + fog mix) and <= 2 remaining levels that bound is 8e-4 —
    inside the 1e-3 radiance contract.

    MEASURED DEAD at eps=1e-4 (1080p builtin, 64-frame sweep): 24.34
    ms/frame vs 24.32 exact-zero — no change. Cause: fog = 1-exp(-2e-6
    t^3) puts the kill radius at (ln(1/eps'))^(1/3) scaling, so eps=1e-4
    only moves the plane-bounce kill from t>~353 (f32 exp underflow) to
    t>~157; the extra horizon band is too thin and too tile-incoherent
    to retire whole bounce tiles. Kept as a profiling knob, default 0
    (the default program is bit-identical to the pre-knob kernel)."""
    return float(os.environ.get("GPURT_TW_EPS", "0") or 0)


def _unroll_levels() -> bool:
    """Unroll the level loop (GPURT_UNROLL_LEVELS): trace the level body
    once per level with a STATIC level index instead of a fori_loop.
    Statically removes the last level's shadow block and the per-level
    write dispatch chain, and lets march budgets/relaxation specialize
    per level (bounce levels' error contribution is scaled by throughput
    <= reflectance ~0.3, so they tolerate caps the primary level can't).
    Cost: ~max_depth x the kernel body at Mosaic compile time."""
    return bool(int(os.environ.get("GPURT_UNROLL_LEVELS", "0") or 0))


def _normalize_exact(v: V3) -> V3:
    """Division-form normalize matching core/hlsl.normalize bit-for-bit
    (V3.normalized uses reciprocal-multiply — ~1 ulp off, enough to flip
    march crossings at silhouettes)."""
    l = jnp.maximum(v.length(), 1e-20)
    return V3(v.x / l, v.y / l, v.z / l)


def _raygen(px, py, width, height, cam: V3, p2w_ref):
    """GenerateCameraRay (RaytracingShaderHelper.hlsli:103-120) from SMEM
    camera state; mirrors core/camera.generate_camera_rays op-for-op."""
    sx = (px.astype(jnp.float32) + 0.5) / jnp.float32(width) * 2.0 - 1.0
    sy = (py.astype(jnp.float32) + 0.5) / jnp.float32(height) * 2.0 - 1.0
    sy = -sy

    def col(c):
        return sx * p2w_ref[0, c] + sy * p2w_ref[1, c] + p2w_ref[3, c]

    w = col(3)
    world = V3(col(0) / w, col(1) / w, col(2) / w)
    origins = V3(world.x * 0.0 + cam.x, world.y * 0.0 + cam.y,
                 world.z * 0.0 + cam.z)
    directions = _normalize_exact(world - cam)
    return origins, directions


def _plane_test(o: V3, d: V3, cvec_ref, t_max):
    """Ground-plane rect test (accel/traverse.intersect_plane)."""
    po_x, po_y, po_z = cvec_ref[5, 0], cvec_ref[5, 1], cvec_ref[5, 2]
    ps_x, ps_z = cvec_ref[6, 0], cvec_ref[6, 1]
    t = -(o.y - po_y) / d.y
    px = o.x + t * d.x
    pz = o.z + t * d.z
    inside = (px >= po_x) & (px <= po_x + ps_x) & (pz >= po_z) & (pz <= po_z + ps_z)
    hit = inside & (d.y < 0.0) & (t >= 0.0) & (t <= t_max)
    return hit, t


def _pick_material(mat_ref, gid, num_materials, material_ids=None):
    """Branchless select chain over the SMEM material table — the
    shader-record local-root-argument fetch (render/trace._gather_materials
    in-kernel). With a deduped table (SceneLayout.material_ids) the
    geometry id maps to its unique slot through a static int chain first
    (identity entries skipped), so the 8-field chain runs over UNIQUE
    materials — 16 instances sharing 3 materials cost 3 field selects per
    field, not 16."""
    if material_ids is not None:
        mid = gid * 0
        for gidx, slot in enumerate(material_ids):
            if slot != 0:
                mid = jnp.where(gid == gidx, slot, mid)
        gid = mid
    fields = []
    for f in range(8):
        out = gid.astype(jnp.float32) * 0.0 + mat_ref[0, f]
        for i in range(1, num_materials):
            out = jnp.where(gid == i, mat_ref[i, f], out)
        fields.append(out)
    albedo = tuple(fields[0:4])  # rgba
    return albedo, fields[4], fields[5], fields[6], fields[7]


def _reflect(d: V3, n: V3) -> V3:
    k = 2.0 * d.dot(n)
    return V3(d.x - k * n.x, d.y - k * n.y, d.z - k * n.z)


def _checkers(hit: V3, n: V3, px, py, width, height, cam: V3, p2w_ref):
    """AnalyticalCheckersTexture (render/checkers.py transcription)."""
    ox, dx = _raygen(px + 1, py, width, height, cam, p2w_ref)
    oy, dy = _raygen(px, py + 1, width, height, cam, p2w_ref)

    def project(o, d):
        num = (o - hit).dot(n)
        den = d.dot(n)
        s = num / den
        return V3(o.x - d.x * s, o.y - d.y * s, o.z - d.z * s)

    pxp = project(ox, dx)
    pyp = project(oy, dy)
    dpdx_u, dpdx_v = pxp.x - hit.x, pxp.z - hit.z
    dpdy_u, dpdy_v = pyp.x - hit.x, pyp.z - hit.z

    def filt(uv, ddx, ddy):
        w = jnp.maximum(jnp.abs(ddx), jnp.abs(ddy))
        a = uv + 0.5 * w
        b = uv - 0.5 * w
        fa = a - jnp.floor(a)
        fb = b - jnp.floor(b)
        i = (jnp.floor(a) + jnp.minimum(fa * CHECKERS_RATIO, 1.0)
             - jnp.floor(b) - jnp.minimum(fb * CHECKERS_RATIO, 1.0)) / (
                 CHECKERS_RATIO * w)
        return i

    iu = filt(hit.x, dpdx_u, dpdy_u)
    iv = filt(hit.z, dpdx_v, dpdy_v)
    return (1.0 - iu) * (1.0 - iv)


def _frame_kernel(
    geoms: Tuple[Tuple[int, int], ...],
    clusters: Tuple[Tuple[int, ...], ...],
    step_budgets: Tuple[int, ...],
    cull_backface: bool,
    order: Tuple[int, ...] | None,
    max_depth: int,
    width: int,
    height: int,
    plane_gid: int,
    num_materials: int,
    material_ids: Tuple[int, ...] | None,
    budget_cap,  # None | (closest_cap, shadow_cap) — SDF march caps
    mb_budget_cap,  # None | (closest_cap, shadow_cap) — metaball caps
    emit_dirty: bool,
    dense: bool,
    defer_shadow: bool,
    tri_offsets: Tuple[Tuple[int, int], ...] | None,
    # refs:
    b2l_ref, l2b_ref, sscale_ref, aabb_ref, mb_ref, mat_ref, p2w_ref,
    cvec_ref,
    *rest,
):
    tr, tc = scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS
    tri_ref = None
    if tri_offsets is not None:
        tri_ref, *rest = rest
    if dense:
        # Compacted-ray form: pixel coordinates arrive as VMEM planes
        # (raster-order dirty-lane queue); -1 marks queue padding.
        px_ref, py_ref, *rest = rest
        px = px_ref[:]
        py = py_ref[:]
    else:
        i = pl.program_id(0)
        j = pl.program_id(1)
        # cvec[7,0] is the band row offset (0 single-chip): under shard_map
        # each device renders pixel rows [off, off + local_height) of the
        # GLOBAL image (parallel/sharding.py sets it from axis_index).
        row_off = cvec_ref[7, 0].astype(jnp.int32)
        py = jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 0) + i * tr + row_off
        px = jax.lax.broadcasted_iota(jnp.int32, (tr, tc), 1) + j * tc
    if defer_shadow:
        # Deferred-shadow plane set (see render_frame_deferred): per level
        # the LIT-variant color contribution; for shadowed levels also the
        # SHADOWED variant, the packed status|capped-geometry info, and
        # the shadow ray (BLAS origin + direction) for the repair queue.
        r_ref = g_ref = b_ref = a_ref = None
        dirty_ref = None
        n_shadow_lvls = max_depth - 1
        cl_refs = [rest[4 * k: 4 * k + 4] for k in range(max_depth)]
        rest = rest[4 * max_depth:]
        cs_refs = [rest[4 * k: 4 * k + 4] for k in range(n_shadow_lvls)]
        rest = rest[4 * n_shadow_lvls:]
        sinfo_refs = list(rest[:n_shadow_lvls])
        rest = rest[n_shadow_lvls:]
        sray_refs = [rest[6 * k: 6 * k + 6] for k in range(n_shadow_lvls)]
        rest = rest[6 * n_shadow_lvls:]
        thit_s, nx_s, ny_s, nz_s, gid_s, *march_scratch = rest
        *march_scratch, sdirty_s = march_scratch
    else:
        r_ref, g_ref, b_ref, a_ref = rest[:4]
        rest = rest[4:]
        if emit_dirty:
            dirty_ref, *rest = rest
        else:
            dirty_ref = None
        sdirty_s = None
        thit_s, nx_s, ny_s, nz_s, gid_s, *march_scratch = rest

    cam = V3(cvec_ref[0, 0], cvec_ref[0, 1], cvec_ref[0, 2])
    light = V3(cvec_ref[1, 0], cvec_ref[1, 1], cvec_ref[1, 2])
    amb = tuple(cvec_ref[2, c] for c in range(4))
    ldiff = tuple(cvec_ref[3, c] for c in range(4))
    blas = V3(cvec_ref[4, 0], cvec_ref[4, 1], cvec_ref[4, 2])
    bg = BACKGROUND_COLOR

    o, d = _raygen(px, py, width, height, cam, p2w_ref)
    zero = o.x * 0.0
    izero = zero.astype(jnp.int32)
    in_image = (py >= 0) & (px >= 0) & (py < height) & (px < width)
    if dirty_ref is not None:
        # Per-lane "any march capped at the budget" accumulator, sticky
        # across levels and both ray types (see render_frame_compact).
        dirty_ref[:] = izero

    state0 = (
        o.x, o.y, o.z, d.x, d.y, d.z,
        in_image.astype(jnp.int32),          # active
        zero + 1.0, zero + 1.0, zero + 1.0, zero + 1.0,  # throughput rgba
        zero, zero, zero, zero,              # color rgba
    )

    def level_body(lvl, state):
        (ox, oy, oz, dx, dy, dz, active_i, tw0, tw1, tw2, tw3,
         c0, c1, c2, c3) = state
        o = V3(ox, oy, oz)
        d = V3(dx, dy, dz)
        active = active_i != 0
        # Unrolled form: lvl is a Python int — level-dependent choices
        # (shadow block, write dispatch, march caps) resolve at trace time.
        static_lvl = isinstance(lvl, int)
        if dirty_ref is not None:
            # Kill-on-cap: dirty lanes are recomputed end-to-end by the
            # dense pass, so every further level is wasted work for them.
            active = active & (dirty_ref[:] == 0)
        # Shadow rays trace at levels where the child radiance recursion
        # is not yet capped (Raytracing.hlsl:117-120; render/trace.py).
        trace_shadow = lvl + 1 < max_depth
        if PROFILE_NO_SHADOWS:
            trace_shadow = trace_shadow & False

        # --- closest hit: plane (closed form) + scene traversal ---------
        hit_p, t_p = _plane_test(o, d, cvec_ref, RAY_TMAX)
        hit_p = hit_p & active
        t0 = jnp.where(hit_p, t_p, RAY_TMAX)
        ob = o - blas

        closest_cap = None if defer_shadow else (
            budget_cap[0] if budget_cap else None
        )
        closest_mb_cap = None if defer_shadow else (
            mb_budget_cap[0] if mb_budget_cap else None
        )

        def closest_traversal():
            scene_kernel._traverse_tile(
                geoms, clusters, step_budgets, cull_backface, False, "single",
                ob, d, active, t0, b2l_ref, l2b_ref, sscale_ref, aabb_ref,
                mb_ref, thit_s, nx_s, ny_s, nz_s, gid_s, dirty_ref,
                tuple(march_scratch), order=order,
                budget_cap=closest_cap,
                mb_budget_cap=closest_mb_cap,
                tri_ref=tri_ref, tri_offsets=tri_offsets, kill_on_cap=True,
                level=lvl,
            )

        # Tile-level activity gate: at bounce levels most tiles are fully
        # dead (sky, non-reflective winners) — skip the whole traversal.
        # Stale scratch reads downstream are masked per-lane by `active`.
        pl.when(jnp.any(active))(closest_traversal)
        if dirty_ref is not None:
            # Lanes newly capped by the closest traversal: drop them now —
            # their shadow and bounce work would be recomputed anyway.
            active = active & (dirty_ref[:] == 0)
        best_t = thit_s[:]
        gid = gid_s[:]
        hit_proc = gid >= 0
        geometry_id = jnp.where(
            hit_proc, gid, jnp.where(hit_p, plane_gid, izero - 1)
        )
        hit = geometry_id >= 0
        t = jnp.where(hit_proc, best_t, jnp.where(hit_p, t0, RAY_TMAX))
        t = jnp.where(hit, t, RAY_TMAX)
        n = V3(
            jnp.where(hit_proc, nx_s[:], 0.0),
            jnp.where(hit_proc, ny_s[:], 1.0),
            jnp.where(hit_proc, nz_s[:], 0.0),
        )
        n = V3(jnp.where(hit, n.x, 0.0), jnp.where(hit, n.y, 0.0),
               jnp.where(hit, n.z, 0.0))
        hit_pos = V3(o.x + t * d.x, o.y + t * d.y, o.z + t * d.z)

        albedo, refl_coef, diff_coef, spec_coef, spec_pow = _pick_material(
            mat_ref, geometry_id, num_materials, material_ids
        )

        # --- Phong geometry terms (hoisted: they decide shadow necessity)
        incident = _normalize_exact(hit_pos - light)
        kd = jnp.clip(-incident.dot(n), 0.0, 1.0)
        refl_l = _normalize_exact(_reflect(incident, n))
        view = _normalize_exact(V3(-d.x, -d.y, -d.z))
        ks = jnp.power(jnp.clip(refl_l.dot(view), 0.0, 1.0), spec_pow)

        # --- shadow occlusion (accept-first) -----------------------------
        sd = _normalize_exact(light - hit_pos)
        shadow_active = active & hit & trace_shadow
        # Exact shadow-necessity gate: shadow_factor scales only the
        # diffuse term (zero when kd == 0) and zeroes the specular term
        # (zero when ks == 0 or spec_coef == 0) — Raytracing.hlsl:50-80.
        # Lanes where both terms are exactly zero render identically lit
        # or shadowed, so skipping their occlusion query is result-exact.
        # This retires e.g. object undersides seen in plane reflections
        # (kd = 0 against the high light) before their self-origin crawl
        # marches start.
        shadow_needed = (kd > 0.0) | ((spec_coef * ks) > 0.0)
        shadow_active = shadow_active & shadow_needed
        hit_p2, _ = _plane_test(hit_pos, sd, cvec_ref, RAY_TMAX)
        hit_p2 = hit_p2 & shadow_active
        t0s = jnp.where(hit_p2, 0.0, RAY_TMAX)
        obs = hit_pos - blas
        shadow_gate = shadow_active & ~hit_p2

        if defer_shadow:
            sdirty_s[:] = izero
            shadow_dirty_ref = sdirty_s
            shadow_kill = True
        else:
            # Compact mode: dirty lanes (from any earlier cap) are fully
            # recomputed by the dense pass — kill their shadow marches too.
            shadow_dirty_ref = dirty_ref
            shadow_kill = True

        def shadow_traversal():
            scene_kernel._traverse_tile(
                geoms, clusters, step_budgets, True, True, "single",
                obs, sd, shadow_gate, t0s, b2l_ref, l2b_ref,
                sscale_ref, aabb_ref, mb_ref, thit_s, nx_s, ny_s, nz_s,
                gid_s, shadow_dirty_ref, tuple(march_scratch), order=order,
                budget_cap=budget_cap[1] if budget_cap else None,
                mb_budget_cap=mb_budget_cap[1] if mb_budget_cap else None,
                tri_ref=tri_ref, tri_offsets=tri_offsets,
                kill_on_cap=shadow_kill,
                # Per-level budgets apply in defer mode too: the in-frame
                # pass caps at min(shadow_cap, level budget) and the repair
                # queue (_shadow_queue_kernel) re-runs unknown lanes at the
                # same per-level budget the plain kernel would use, so
                # deferred == plain holds at ANY knob setting (test_defer).
                level=lvl,
            )

        # Skipping is exact: when no lane needs the occlusion query, the
        # stale gid_s is masked by shadow_active below (plane-occluded
        # lanes use hit_p2 directly). Unrolled last level: trace_shadow is
        # statically False — the whole occlusion traversal drops out of
        # the program (shadow_active is all-False so the masked reads
        # below are exact without it).
        if not (static_lvl and trace_shadow is False):
            pl.when(jnp.any(shadow_gate))(shadow_traversal)
        in_shadow = (hit_p2 | (gid_s[:] >= 0)) & shadow_active

        # --- Phong + fake AO (render/shade.phong_lighting) ---------------
        # Both shadow variants are computed; in defer mode the final pick
        # happens in the XLA recomposition (render_frame_deferred) once
        # the repair queue resolves the capped occlusion queries.
        # (kd / ks hoisted above the occlusion query — shadow necessity.)
        ao = 1.0 - jnp.clip(-n.y, 0.0, 1.0)
        ambient = tuple(
            albedo[c] * ((amb[c] - 0.1) + ao * (amb[c] - (amb[c] - 0.1)))
            for c in range(4)
        )

        def phong_variant(shadowed):
            shadow_factor = IN_SHADOW_RADIANCE if shadowed else 1.0
            dterm = shadow_factor * diff_coef * kd
            sterm = 0.0 if shadowed else spec_coef * ks
            return tuple(
                ambient[c] + dterm * ldiff[c] * albedo[c] + sterm
                for c in range(4)
            )

        shadow_factor = jnp.where(in_shadow, IN_SHADOW_RADIANCE, 1.0)
        dterm = shadow_factor * diff_coef * kd
        sterm = jnp.where(in_shadow, 0.0, spec_coef * ks)
        phong = tuple(
            ambient[c] + dterm * ldiff[c] * albedo[c] + sterm
            for c in range(4)
        )

        # --- checkers on plane hits (render/checkers.py) -----------------
        k_check = _checkers(hit_pos, n, px, py, width, height, cam, p2w_ref)
        k = jnp.where(geometry_id == plane_gid, k_check, 1.0)

        # --- Fresnel-weighted reflection multiplier ----------------------
        cosi = jnp.clip(-(d.dot(n)), 0.0, 1.0)
        f1 = 1.0 - cosi
        f5 = (f1 * f1) * (f1 * f1) * f1
        fresnel = tuple(albedo[c] + (1.0 - albedo[c]) * f5 for c in range(3))
        reflective = hit & (refl_coef > REFLECTANCE_EPS)
        refl_mult = tuple(
            jnp.where(reflective, refl_coef * (fresnel[c] if c < 3 else 1.0), 0.0)
            for c in range(4)
        )

        # --- fog + color recurrence (render/trace.py) --------------------
        fog = 1.0 - jnp.exp(-0.000002 * t * t * t)
        base = tuple(
            jnp.where(hit, (1.0 - fog) * (k * phong[c]) + fog * bg[c], bg[c])
            for c in range(4)
        )
        mult = tuple(
            jnp.where(hit, (1.0 - fog) * k * refl_mult[c], 0.0)
            for c in range(4)
        )
        tw = (tw0, tw1, tw2, tw3)
        c_out = tuple(
            cc + jnp.where(active, twc * bc, 0.0)
            for cc, twc, bc in zip((c0, c1, c2, c3), tw, base)
        )
        tw_out = tuple(twc * mc for twc, mc in zip(tw, mult))
        # Exact dead-throughput kill: a lane whose outgoing throughput is
        # exactly zero on every channel (fog saturated to 1.0 in f32 at
        # the horizon, a checker factor of exactly 0, or a zero Fresnel
        # product) adds where(active, 0 * base, 0) == +0.0 at every later
        # level — deactivating it is result-exact and lets bounce-level
        # tile gates retire whole tiles.
        eps = _tw_eps()
        if eps > 0.0:
            # Throughput channels are products of nonnegative factors
            # ((1-fog), checkers k, Fresnel, reflectance), so a one-sided
            # compare is the full |tw| <= eps test.
            tw_live = (
                (tw_out[0] > eps) | (tw_out[1] > eps)
                | (tw_out[2] > eps) | (tw_out[3] > eps)
            )
        else:
            tw_live = (
                (tw_out[0] != 0.0) | (tw_out[1] != 0.0)
                | (tw_out[2] != 0.0) | (tw_out[3] != 0.0)
            )
        active_out = active & reflective & tw_live
        d_out = _reflect(d, n)

        if defer_shadow:
            # Per-level color contributions, both shadow variants; the
            # level index is traced (fori_loop), so writes ride pl.when.
            phong_l = phong_variant(False)
            phong_s = phong_variant(True)

            def level_term(ph):
                bb = tuple(
                    jnp.where(hit, (1.0 - fog) * (k * ph[c]) + fog * bg[c],
                              bg[c])
                    for c in range(4)
                )
                return tuple(
                    jnp.where(active, twc * bc, 0.0)
                    for twc, bc in zip(tw, bb)
                )

            term_l = level_term(phong_l)
            term_s = level_term(phong_s)
            # Status: 0 = definitely lit, 1 = definitely shadowed,
            # 2 = unknown (a capped march, no hit found) — repair queue.
            sdirty_bits = sdirty_s[:]
            unknown = shadow_gate & ~in_shadow & (sdirty_bits != 0)
            sstat = jnp.where(
                in_shadow, izero + 1, jnp.where(unknown, izero + 2, izero)
            )
            sinfo = sstat | (sdirty_bits << 2)
            for lk in range(max_depth):
                def write_level(lk=lk):
                    for c in range(4):
                        cl_refs[lk][c][:] = term_l[c]
                    if lk < max_depth - 1:
                        for c in range(4):
                            cs_refs[lk][c][:] = term_s[c]
                        sinfo_refs[lk][:] = sinfo
                        sr = sray_refs[lk]
                        sr[0][:] = obs.x
                        sr[1][:] = obs.y
                        sr[2][:] = obs.z
                        sr[3][:] = sd.x
                        sr[4][:] = sd.y
                        sr[5][:] = sd.z

                if static_lvl:
                    if lvl == lk:
                        write_level()
                else:
                    pl.when(lvl == lk)(write_level)

        return (
            hit_pos.x, hit_pos.y, hit_pos.z, d_out.x, d_out.y, d_out.z,
            active_out.astype(jnp.int32), *tw_out, *c_out,
        )

    if _unroll_levels():
        state = state0
        for lvl in range(max_depth):
            state = level_body(lvl, state)
    else:
        state = jax.lax.fori_loop(0, max_depth, level_body, state0)
    if not defer_shadow:
        r_ref[:] = state[11]
        g_ref[:] = state[12]
        b_ref[:] = state[13]
        a_ref[:] = state[14]


def _norm_caps(cap):
    """Normalize a march-cap spec: None | int | (closest, shadow)."""
    if cap is None:
        return None
    if isinstance(cap, int):
        return (cap, cap)
    return tuple(cap)


def _prepare_call(materials, aabbs, step_scales, b2l_rows, l2b_rot, mb_params,
                  p2w, cvec, geoms, clusters, step_budgets, tri_rows=None):
    """Shared SMEM packing for all frame-kernel call forms."""
    from gpuraytracer_tpu.core.types import SDF_MAX_STEPS

    g = len(geoms)
    if step_budgets is None:
        step_budgets = (SDF_MAX_STEPS,) * g
    if clusters is None:
        clusters = (tuple(range(g)),)
    if len(clusters) > 1:
        cl_min = jnp.stack([jnp.min(aabbs[list(c), :3], axis=0) for c in clusters])
        cl_max = jnp.stack([jnp.max(aabbs[list(c), 3:], axis=0) for c in clusters])
        aabbs = jnp.concatenate(
            [aabbs, jnp.concatenate([cl_min, cl_max], axis=-1)], axis=0
        )

    def smem(shape):
        return pl.BlockSpec(shape, lambda i, j: tuple(0 for _ in shape),
                            memory_space=pltpu.SMEM)

    f32 = jnp.float32
    m = materials.shape[0]
    smem_args = (
        b2l_rows.astype(f32), l2b_rot.astype(f32),
        step_scales.astype(f32).reshape(g, 1), aabbs.astype(f32),
        mb_params.astype(f32), materials.astype(f32), p2w.astype(f32),
        cvec.astype(f32),
    )
    smem_specs = [
        smem((g, 12)), smem((g, 9)), smem((g, 1)),
        smem((aabbs.shape[0], 6)), smem((3, 4)), smem((m, 8)),
        smem((4, 4)), smem((8, 4)),
    ]
    if tri_rows is not None:
        smem_args = smem_args + (tri_rows.astype(f32),)
        smem_specs = smem_specs + [smem(tuple(tri_rows.shape))]
    return smem_args, smem_specs, tuple(step_budgets), tuple(clusters), int(m)


def _march_bank(tr, tc):
    # One SDF march state bank (scene_kernel._march_sdf_part layout:
    # t, steps, done, paused, resume, thit, rprev/t_prev, oon).
    f32 = jnp.float32
    return [
        pltpu.VMEM((tr, tc), f32),
        pltpu.VMEM((tr, tc), jnp.int32),
        pltpu.VMEM((tr, tc), jnp.int32),
        pltpu.VMEM((tr, tc), jnp.int32),
        pltpu.VMEM((tr, tc), jnp.int32),
        pltpu.VMEM((tr, tc), f32),
        pltpu.VMEM((tr, tc), f32),
        pltpu.VMEM((tr, tc), jnp.int32),
    ]


def _frame_scratch(tr, tc, geoms=None):
    f32 = jnp.float32
    scratch = [
        pltpu.VMEM((tr, tc), f32),   # thit
        pltpu.VMEM((tr, tc), f32),   # nx
        pltpu.VMEM((tr, tc), f32),   # ny
        pltpu.VMEM((tr, tc), f32),   # nz
        pltpu.VMEM((tr, tc), jnp.int32),  # gid
    ] + _march_bank(tr, tc)
    # Merged occlusion march (scene_kernel._march_sdf_multi): one
    # 16-plane state bank per SDF geometry (the 8 march planes + the
    # loop-constant local ray / escape / t_max planes), plus the shared
    # killed plane. ~256 KB/bank at 32x128 — VMEM is ~16 MB.
    if geoms is not None and scene_kernel.merged_shadow_enabled():
        f32 = jnp.float32
        n_sdf = sum(
            1 for k, _ in geoms
            if k == int(IntersectorKind.SIGNED_DISTANCE)
        )
        if n_sdf >= 2:
            for _ in range(n_sdf):
                scratch += _march_bank(tr, tc) + [
                    pltpu.VMEM((tr, tc), f32) for _ in range(8)
                ]
            scratch.append(pltpu.VMEM((tr, tc), jnp.int32))  # killed
    return scratch


@functools.partial(
    jax.jit,
    static_argnames=(
        "geoms", "clusters", "step_budgets", "cull_backface", "order",
        "max_depth", "width", "height", "plane_gid", "material_ids",
        "interpret",
        "budget_cap", "mb_budget_cap", "emit_dirty", "local_height",
        "tri_offsets",
    ),
)
def render_frame_tiles(
    b2l_rows,  # (G, 12) f32
    l2b_rot,  # (G, 9) f32
    step_scales,  # (G,) f32
    aabbs,  # (G, 6) f32
    mb_params,  # (3, 4) f32
    materials,  # (M, 8) f32: albedo rgba, refl, diff, spec, spow
    p2w,  # (4, 4) f32 row-vector projection_to_world
    cvec,  # (8, 4) f32: cam, light, amb, ldiff, blas_offset, plane_o, plane_s
    tri_rows=None,  # (F, 12) f32 mesh face rows or None
    *,
    geoms: Tuple[Tuple[int, int], ...],
    clusters: Tuple[Tuple[int, ...], ...] | None = None,
    step_budgets: Tuple[int, ...] | None = None,
    cull_backface: bool = True,
    order: Tuple[int, ...] | None = None,
    max_depth: int = 3,
    width: int,
    height: int,
    plane_gid: int,
    material_ids: Tuple[int, ...] | None = None,
    budget_cap=None,
    mb_budget_cap=None,
    emit_dirty: bool = False,
    local_height: int | None = None,
    tri_offsets: Tuple[Tuple[int, int], ...] | None = None,
    interpret: bool = False,
):
    """Returns an (H, W, 4) f32 radiance image from ONE pallas_call.

    budget_cap: cap every SDF step budget at this value (marches that cap
    are flagged per-lane when emit_dirty — see render_frame_compact).
    emit_dirty: additionally return the (H, W) int32 dirty plane.
    local_height: under shard_map, the per-device band height (raygen uses
    the GLOBAL width/height plus the cvec[7,0] row offset)."""
    tr, tc = scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS
    lh = local_height if local_height is not None else height
    hp = lh + (-lh) % tr
    wp = width + (-width) % tc
    grid = (hp // tr, wp // tc)

    smem_args, smem_specs, step_budgets, clusters, m = _prepare_call(
        materials, aabbs, step_scales, b2l_rows, l2b_rot, mb_params, p2w,
        cvec, geoms, clusters, step_budgets, tri_rows,
    )
    tile_spec = pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    f32 = jnp.float32
    # Under shard_map the outputs must declare their varying mesh axes;
    # cvec carries the per-device row offset, so it is the varying input.
    vma = getattr(jax.typeof(smem_args[7]), "vma", None)
    vkw = {"vma": vma} if vma else {}
    n_out = 5 if emit_dirty else 4
    outs = [jax.ShapeDtypeStruct((hp, wp), f32, **vkw) for _ in range(4)]
    if emit_dirty:
        outs.append(jax.ShapeDtypeStruct((hp, wp), jnp.int32, **vkw))
    kernel = functools.partial(
        _frame_kernel, tuple(geoms), clusters, step_budgets,
        cull_backface, tuple(order) if order is not None else None,
        max_depth, width, height, plane_gid,
        m, material_ids, _norm_caps(budget_cap), _norm_caps(mb_budget_cap), emit_dirty,
        False, False,
        tuple(tri_offsets) if tri_rows is not None else None,
    )
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=smem_specs,
        out_specs=[tile_spec] * n_out,
        out_shape=outs,
        scratch_shapes=_frame_scratch(tr, tc, geoms),
        interpret=interpret,
    )(*smem_args)
    r, gc, b, a = res[:4]
    img = jnp.stack(
        [r[:lh, :width], gc[:lh, :width], b[:lh, :width],
         a[:lh, :width]], axis=-1,
    )
    if emit_dirty:
        return img, res[4][:lh, :width]
    return img


# Default SDF step-budget cap for the compacted two-round frame: pass 1
# marches at most this many steps per (lane, geometry); capped lanes are
# re-rendered end-to-end in dense queue tiles at full budget. Sweepable
# via GPURT_COMPACT_BUDGET (profiling); metaball budgets are never capped
# (their interval marches are bounded at 128 and cheap — DEVNOTES).
COMPACT_BUDGET = 64
# Dirty-queue capacity as a fraction denominator of the padded pixel count
# (1/8 = 12.5%); overflow falls back to the uncompacted full-budget kernel.
COMPACT_CAP_DIV = 8


# Which fused-frame form render_frame routes to by default. "defer" =
# deferred-shadow compaction (render_frame_deferred — occlusion marches
# capped, unknowns repaired via the sorted dense queue); "compact" =
# whole-pixel two-round form; "plain" = single full-budget kernel.
# Overridable per-process via GPURT_FRAME_MODE.
# Measured (round 3, 1080p builtin, v5e device slopes): plain 57.3 ms —
# the compaction modes lose on this workload (compact 79-86 ms: dirty
# pixels are the expensive ones and re-pay all five traversals; defer
# 125 ms at cap 32: the repair queue destroys the shadow pass's spatial
# locality, so queue tiles march every geometry at full budget). They
# remain selectable for workloads with deeper march tails.
DEFAULT_FRAME_MODE = "plain"


def frame_mode() -> str:
    m = os.environ.get("GPURT_FRAME_MODE", "")
    if m in ("plain", "compact", "defer"):
        return m
    if os.environ.get("GPURT_DISABLE_COMPACT"):
        return "plain"
    return DEFAULT_FRAME_MODE


def compact_enabled() -> bool:
    return frame_mode() != "plain"


@functools.partial(
    jax.jit,
    static_argnames=(
        "geoms", "clusters", "step_budgets", "cull_backface", "order",
        "max_depth", "width", "height", "plane_gid", "material_ids",
        "interpret",
        "budget_cap", "mb_budget_cap", "cap_lanes", "debug_count",
        "local_height", "tri_offsets",
    ),
)
def render_frame_compact(
    b2l_rows, l2b_rot, step_scales, aabbs, mb_params, materials, p2w, cvec,
    tri_rows=None,
    *,
    geoms: Tuple[Tuple[int, int], ...],
    clusters: Tuple[Tuple[int, ...], ...] | None = None,
    step_budgets: Tuple[int, ...] | None = None,
    cull_backface: bool = True,
    order: Tuple[int, ...] | None = None,
    max_depth: int = 3,
    width: int,
    height: int,
    plane_gid: int,
    material_ids: Tuple[int, ...] | None = None,
    budget_cap=None,
    mb_budget_cap=None,
    cap_lanes: int | None = None,
    debug_count: bool = False,
    local_height: int | None = None,
    tri_offsets: Tuple[Tuple[int, int], ...] | None = None,
    interpret: bool = False,
):
    """Two-round compacted frame — ray compaction for the march convoy.

    Round 1 runs the fused frame kernel with every SDF march capped at
    `budget_cap` steps and tracks, per lane, whether ANY march (any level,
    closest or occlusion) hit the cap. Round 2 extracts the dirty lanes'
    raster indices (coherent by construction — silhouette/crawl pixels
    cluster by object in raster order), recomputes those pixels end-to-end
    at the full reference budgets in dense (TILE_ROWS, TILE_COLS) queue
    tiles, and
    scatters the colors back.

    Bit-identical to the full-budget kernel: a march that resolves within
    the cap is a strict prefix of the full march (the round-2 two-phase
    argument, tests/test_scene_kernel.py::test_two_phase_bit_identical),
    and every lane with a capped march is recomputed from raygen with
    nothing reused. If the dirty count overflows the queue capacity the
    whole frame falls back to the uncompacted kernel (lax.cond) — never
    wrong, only slower.

    This is the TPU-native replacement for the reference's free SIMT
    per-thread loop exit (SignedDistancePrimitives.hlsli:291-317): tiles
    march to their slowest lane, so one 512-step crawl lane otherwise
    holds 2048 lanes hostage; here it costs 64 steps in round 1 plus one
    densely-packed queue slot in round 2.
    """
    from gpuraytracer_tpu.core.types import METABALL_MAX_STEPS, SDF_MAX_STEPS

    tr, tc = scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS
    lh = local_height if local_height is not None else height
    hp = lh + (-lh) % tr
    wp = width + (-width) % tc
    grid = (hp // tr, wp // tc)
    if budget_cap is None:
        budget_cap = int(os.environ.get("GPURT_COMPACT_BUDGET", COMPACT_BUDGET))

    # Scenes where no march can cap (no SDF/metaball geometry, or caps at
    # or above the full budgets) gain nothing from the two-round machinery
    # — the dirty plane would be identically zero. Render plainly: one
    # kernel instead of three (matters for compile time on e.g. the
    # analytic-grid benchmark config as much as for runtime).
    sb = step_budgets
    if sb is None:
        sb = (SDF_MAX_STEPS,) * len(geoms)
    caps = _norm_caps(budget_cap)
    mcaps = _norm_caps(mb_budget_cap)
    cappable = any(
        (k == int(IntersectorKind.SIGNED_DISTANCE)
         and caps is not None and min(caps) < sb[i])
        or (k == int(IntersectorKind.VOLUMETRIC)
            and mcaps is not None and min(mcaps) < METABALL_MAX_STEPS)
        for i, (k, _) in enumerate(geoms)
    )
    if not cappable:
        img = render_frame_tiles(
            b2l_rows, l2b_rot, step_scales, aabbs, mb_params, materials,
            p2w, cvec, tri_rows,
            geoms=geoms, clusters=clusters, step_budgets=step_budgets,
            cull_backface=cull_backface, order=order, max_depth=max_depth,
            width=width, height=height, plane_gid=plane_gid,
            local_height=local_height, tri_offsets=tri_offsets,
            interpret=interpret,
        )
        if debug_count:
            return img, jnp.zeros((), jnp.int32)
        return img

    smem_args, smem_specs, step_budgets, clusters, m = _prepare_call(
        materials, aabbs, step_scales, b2l_rows, l2b_rot, mb_params, p2w,
        cvec, geoms, clusters, step_budgets, tri_rows,
    )
    tile_spec = pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    f32 = jnp.float32
    vma = getattr(jax.typeof(smem_args[7]), "vma", None)
    vkw = {"vma": vma} if vma else {}

    def call_main():
        kernel = functools.partial(
            _frame_kernel, tuple(geoms), clusters, step_budgets,
            cull_backface, tuple(order) if order is not None else None,
            max_depth, width, height, plane_gid, m, material_ids,
            _norm_caps(budget_cap), _norm_caps(mb_budget_cap), True, False,
            False,
            tuple(tri_offsets) if tri_rows is not None else None,
        )
        outs = [jax.ShapeDtypeStruct((hp, wp), f32, **vkw) for _ in range(4)]
        outs.append(jax.ShapeDtypeStruct((hp, wp), jnp.int32, **vkw))
        return pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=smem_specs,
            out_specs=[tile_spec] * 5,
            out_shape=outs,
            scratch_shapes=_frame_scratch(tr, tc, geoms),
            interpret=interpret,
        )(*smem_args)

    r0, g0, b0, a0, dirty = call_main()

    lanes = hp * wp
    cap = cap_lanes
    if cap is None:
        cap = max(tr * tc, lanes // COMPACT_CAP_DIV)
    cap = cap + (-cap) % (tr * tc)
    cap = min(cap, lanes + (-lanes) % (tr * tc))

    dirty_codes = dirty.reshape(-1)
    dirty_flat = dirty_codes != 0
    count = jnp.sum(dirty_flat.astype(jnp.int32))
    (idx,) = jnp.nonzero(dirty_flat, size=cap, fill_value=-1)
    idx = idx.astype(jnp.int32)
    valid = idx >= 0
    # Ray SORTING (the north-star's second half): group the queue by its
    # per-geometry capped-march bitmask so a dense tile's full-budget
    # marches concentrate on one cap-set. Unsorted raster order mixes
    # pixels capped on different geometries into the same tile, and the
    # tile then pays EVERY geometry's worst-lane 512-step convoy
    # (measured 86 ms vs 57 plain at 1080p). The argsort runs on the
    # compacted queue (cap entries), not the full image — O(cap log cap),
    # stable, so raster coherence survives within each group.
    codes = jnp.where(valid, dirty_codes[jnp.maximum(idx, 0)], jnp.int32(2**30))
    sort_perm = jnp.argsort(codes, stable=True)
    idx = idx[sort_perm]
    valid = idx >= 0
    # Queue indices are in LOCAL padded raster space; the dense kernel
    # raygens from GLOBAL pixel coordinates, so bands add their offset.
    row_off = smem_args[7][7, 0].astype(jnp.int32)
    qpy = jnp.where(valid, idx // wp + row_off, -1).reshape(cap // tc, tc)
    qpx = jnp.where(valid, idx % wp, -1).reshape(cap // tc, tc)

    def call_dense():
        rows = cap // tc
        kernel = functools.partial(
            _frame_kernel, tuple(geoms), clusters, step_budgets,
            cull_backface, tuple(order) if order is not None else None,
            max_depth, width, height, plane_gid, m, material_ids,
            None, None, False, True, False,
            tuple(tri_offsets) if tri_rows is not None else None,
        )
        outs = [jax.ShapeDtypeStruct((rows, tc), f32, **vkw) for _ in range(4)]
        return pl.pallas_call(
            kernel,
            grid=(rows // tr, 1),
            in_specs=smem_specs + [tile_spec, tile_spec],
            out_specs=[tile_spec] * 4,
            out_shape=outs,
            scratch_shapes=_frame_scratch(tr, tc, geoms),
            interpret=interpret,
        )(*smem_args, qpx, qpy)

    rd, gd, bd, ad = call_dense()

    def patched(_):
        def patch(plane, dense_plane):
            return plane.reshape(-1).at[idx].set(
                dense_plane.reshape(-1), mode="drop"
            ).reshape(hp, wp)

        return (patch(r0, rd), patch(g0, gd), patch(b0, bd), patch(a0, ad))

    def fallback(_):
        kernel = functools.partial(
            _frame_kernel, tuple(geoms), clusters, step_budgets,
            cull_backface, tuple(order) if order is not None else None,
            max_depth, width, height, plane_gid, m, material_ids,
            None, None, False, False, False,
            tuple(tri_offsets) if tri_rows is not None else None,
        )
        outs = [jax.ShapeDtypeStruct((hp, wp), f32, **vkw) for _ in range(4)]
        return tuple(pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=smem_specs,
            out_specs=[tile_spec] * 4,
            out_shape=outs,
            scratch_shapes=_frame_scratch(tr, tc, geoms),
            interpret=interpret,
        )(*smem_args))

    r, gc, b, a = jax.lax.cond(count <= cap, patched, fallback, None)
    img = jnp.stack(
        [r[:lh, :width], gc[:lh, :width], b[:lh, :width],
         a[:lh, :width]], axis=-1,
    )
    if debug_count:
        return img, count
    return img




def _shadow_queue_kernel(
    geoms, clusters, step_budgets, order,
    tri_offsets, cap_rows,
    # refs:
    b2l_ref, l2b_ref, sscale_ref, aabb_ref, mb_ref,
    *rest,
):
    """Dense occlusion-repair kernel: one accept-first traversal at FULL
    budgets over the compacted shadow-unknown queue (BLAS-space rays).
    This is where deferred capped shadow marches finish — a queue tile is
    sorted by capped-geometry code, so its long marches share one
    geometry instead of convoying across all of them.

    The queue concatenates one `cap_rows`-row segment per shadowed LEVEL
    (render_frame_deferred builds them in level order, cap_rows a multiple
    of the tile height), so a tile's recursion depth is program_id
    arithmetic — the repair honors the per-level occlusion budget
    (sdf.bounce_shadow_budget_cap) exactly like the plain kernel."""
    tri_ref = None
    if tri_offsets is not None:
        tri_ref, *rest = rest
    (qox, qoy, qoz, qdx, qdy, qdz, qact,
     occ_ref, thit_s, nx_s, ny_s, nz_s, gid_s, *march_scratch) = rest
    o = V3(qox[:], qoy[:], qoz[:])
    d = V3(qdx[:], qdy[:], qdz[:])
    active = qact[:] != 0
    t0 = jnp.where(active, RAY_TMAX, 0.0)
    tr = qox.shape[0]
    lvl = (pl.program_id(0) * tr) // cap_rows

    def traverse():
        scene_kernel._traverse_tile(
            geoms, clusters, step_budgets, True, True, "single",
            o, d, active, t0, b2l_ref, l2b_ref, sscale_ref, aabb_ref,
            mb_ref, thit_s, nx_s, ny_s, nz_s, gid_s, None,
            tuple(march_scratch), order=order,
            tri_ref=tri_ref, tri_offsets=tri_offsets, level=lvl,
        )

    pl.when(jnp.any(active))(traverse)
    occ_ref[:] = (active & (gid_s[:] >= 0)).astype(jnp.int32)


# Deferred-shadow defaults: occlusion marches cap here in round 1 (the
# crawl/long-tail shadow lanes go to the repair queue instead of convoying
# their tiles); sweepable via GPURT_SHADOW_CAP.
SHADOW_CAP = 32


@functools.partial(
    jax.jit,
    static_argnames=(
        "geoms", "clusters", "step_budgets", "cull_backface", "order",
        "max_depth", "width", "height", "plane_gid", "material_ids",
        "interpret",
        "shadow_cap", "mb_shadow_cap", "cap_lanes", "debug_count",
        "local_height", "tri_offsets", "qsort",
    ),
)
def render_frame_deferred(
    b2l_rows, l2b_rot, step_scales, aabbs, mb_params, materials, p2w, cvec,
    tri_rows=None,
    *,
    geoms: Tuple[Tuple[int, int], ...],
    clusters: Tuple[Tuple[int, ...], ...] | None = None,
    step_budgets: Tuple[int, ...] | None = None,
    cull_backface: bool = True,
    order: Tuple[int, ...] | None = None,
    max_depth: int = 3,
    width: int,
    height: int,
    plane_gid: int,
    material_ids: Tuple[int, ...] | None = None,
    shadow_cap: int | None = None,
    mb_shadow_cap: int | None = None,
    cap_lanes: int | None = None,
    debug_count: bool = False,
    local_height: int | None = None,
    tri_offsets: Tuple[Tuple[int, int], ...] | None = None,
    qsort: str = "block-code",
    interpret: bool = False,
):
    """Deferred-shadow frame: ray compaction applied ONLY where it pays.

    Occlusion results do not cascade — a level\'s in_shadow flag scales
    that level\'s color contribution and nothing else (no ray, throughput,
    or recursion state depends on it; render/trace.py affine recurrence).
    So occlusion marches run budget-capped in the fused kernel, which
    emits per-level color contributions in BOTH shadow variants plus a
    three-way status (lit / shadowed / unknown). The unknown lanes — the
    crawl and long-march tail that otherwise convoys whole tiles for the
    full 512 steps — are compacted (sorted by capped-geometry code) into
    dense queue tiles that run ONE accept-first traversal at full budget,
    and the final image is recomposed in XLA by summing the per-level
    contributions in the kernel\'s own association order with the correct
    variant selected per level. March results and occlusion booleans are
    EXACTLY those of the uncompacted kernel (strict-prefix caps +
    accept-first zeroing; queue lanes re-run the full query from scratch);
    the recomposed radiance agrees to shading-ulp (~1e-7 — the two kernel
    programs' shading chains compile with different fusion grouping, the
    same cross-program floor DEVNOTES documents), far inside the 1e-3
    budget. Closest-hit marches are never capped here (they DO cascade;
    whole-pixel requeues were measured slower than the convoy they fix).

    Queue overflow falls back to the plain full-budget kernel (lax.cond).
    """
    from gpuraytracer_tpu.core.types import METABALL_MAX_STEPS

    tr, tc = scene_kernel.TILE_ROWS, scene_kernel.TILE_COLS
    lh = local_height if local_height is not None else height
    hp = lh + (-lh) % tr
    wp = width + (-width) % tc
    grid = (hp // tr, wp // tc)
    if shadow_cap is None:
        shadow_cap = int(os.environ.get("GPURT_SHADOW_CAP", SHADOW_CAP))

    smem_args, smem_specs, step_budgets, clusters, m = _prepare_call(
        materials, aabbs, step_scales, b2l_rows, l2b_rot, mb_params, p2w,
        cvec, geoms, clusters, step_budgets, tri_rows,
    )
    sb = step_budgets
    cappable = max_depth >= 2 and any(
        (kk == int(IntersectorKind.SIGNED_DISTANCE) and shadow_cap < sb[i])
        or (kk == int(IntersectorKind.VOLUMETRIC)
            and mb_shadow_cap is not None
            and mb_shadow_cap < METABALL_MAX_STEPS)
        for i, (kk, _) in enumerate(geoms)
    )
    if not cappable:
        img = render_frame_tiles(
            b2l_rows, l2b_rot, step_scales, aabbs, mb_params, materials,
            p2w, cvec, tri_rows,
            geoms=geoms, clusters=clusters,
            step_budgets=step_budgets,
            cull_backface=cull_backface, order=order, max_depth=max_depth,
            width=width, height=height, plane_gid=plane_gid,
            local_height=local_height, tri_offsets=tri_offsets,
            interpret=interpret,
        )
        if debug_count:
            return img, jnp.zeros((), jnp.int32)
        return img

    tile_spec = pl.BlockSpec((tr, tc), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM)
    f32 = jnp.float32
    vma = getattr(jax.typeof(smem_args[7]), "vma", None)
    vkw = {"vma": vma} if vma else {}
    nsl = max_depth - 1  # shadowed levels

    # --- round 1: fused kernel, capped occlusion, contribution planes ---
    kernel = functools.partial(
        _frame_kernel, tuple(geoms), clusters, step_budgets,
        cull_backface, tuple(order) if order is not None else None,
        max_depth, width, height, plane_gid, m, material_ids,
        (None, shadow_cap), (None, mb_shadow_cap), False, False, True,
        tuple(tri_offsets) if tri_rows is not None else None,
    )
    n_out = 4 * max_depth + 4 * nsl + nsl + 6 * nsl
    outs = (
        [jax.ShapeDtypeStruct((hp, wp), f32, **vkw)] * (4 * max_depth + 4 * nsl)
        + [jax.ShapeDtypeStruct((hp, wp), jnp.int32, **vkw)] * nsl
        + [jax.ShapeDtypeStruct((hp, wp), f32, **vkw)] * (6 * nsl)
    )
    scratch = _frame_scratch(tr, tc, geoms) + [pltpu.VMEM((tr, tc), jnp.int32)]
    res = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=smem_specs,
        out_specs=[tile_spec] * n_out,
        out_shape=outs,
        scratch_shapes=scratch,
        interpret=interpret,
    )(*smem_args)
    cl = [res[4 * kx: 4 * kx + 4] for kx in range(max_depth)]
    res = res[4 * max_depth:]
    cs = [res[4 * kx: 4 * kx + 4] for kx in range(nsl)]
    res = res[4 * nsl:]
    sinfo = list(res[:nsl])
    res = res[nsl:]
    srays = [res[6 * kx: 6 * kx + 6] for kx in range(nsl)]

    # --- queue build: per-level unknown lanes, sorted by capped code ----
    lanes = hp * wp
    cap = cap_lanes
    if cap is None:
        cap = max(tr * tc, lanes // COMPACT_CAP_DIV)
    cap = cap + (-cap) % (tr * tc)
    cap = min(cap, lanes + (-lanes) % (tr * tc))

    idxs = []
    counts = []
    for kx in range(nsl):
        info = sinfo[kx].reshape(-1)
        unk = (info & 3) == 2
        counts.append(jnp.sum(unk.astype(jnp.int32)))
        (idx,) = jnp.nonzero(unk, size=cap, fill_value=-1)
        idx = idx.astype(jnp.int32)
        # Queue order controls BOTH convoy alignment (same capped geometry
        # per dense tile) and spatial locality (few AABB gates pass per
        # tile). Pure code-sorting scattered each tile's rays across the
        # whole scene and every geometry marched at full budget (measured
        # 0.6 ms per dense tile); raster order alone mixes capped
        # geometries. Default: raster BLOCKS (16-image-row regions) as the
        # primary key, capped-geometry code within the block.
        if qsort == "raster":
            perm = None
        else:
            codes = jnp.where(idx >= 0, info[jnp.maximum(idx, 0)] >> 2,
                              jnp.int32(2 ** 30))
            if qsort == "block-code":
                block = jnp.where(idx >= 0, idx >> 15, jnp.int32(2 ** 14))
                codes = block * 1024 + jnp.minimum(codes, 1023)
            perm = jnp.argsort(codes, stable=True)
        idxs.append(idx if perm is None else idx[perm])

    def gather_plane(plane, idx):
        return jnp.where(idx >= 0, plane.reshape(-1)[jnp.maximum(idx, 0)], -1.0)

    qplanes = []
    for c in range(6):
        parts = [gather_plane(srays[kx][c], idxs[kx]) for kx in range(nsl)]
        qplanes.append(jnp.concatenate(parts).reshape(-1, tc))
    qact = jnp.concatenate(
        [(idxs[kx] >= 0).astype(jnp.int32) for kx in range(nsl)]
    ).reshape(-1, tc)
    rows = qact.shape[0]

    # --- round 2: dense occlusion repair ---------------------------------
    qkernel = functools.partial(
        _shadow_queue_kernel, tuple(geoms), clusters, step_budgets,
        tuple(order) if order is not None else None,
        tuple(tri_offsets) if tri_rows is not None else None,
        cap // tc,
    )
    (occ,) = pl.pallas_call(
        qkernel,
        grid=(rows // tr, 1),
        in_specs=(smem_specs[:5]
                  + (smem_specs[8:9] if tri_rows is not None else [])
                  + [tile_spec] * 7),
        out_specs=[tile_spec],
        out_shape=[jax.ShapeDtypeStruct((rows, tc), jnp.int32, **vkw)],
        scratch_shapes=_frame_scratch(tr, tc, geoms),
        interpret=interpret,
    )(*smem_args[:5],
      *((smem_args[8],) if tri_rows is not None else ()),
      *qplanes, qact)

    occ_flat = occ.reshape(-1)
    occ_lvl = []
    for kx in range(nsl):
        seg = occ_flat[kx * cap: (kx + 1) * cap]
        plane = jnp.zeros((lanes,), jnp.int32).at[idxs[kx]].set(
            seg, mode="drop"
        )
        occ_lvl.append(plane.reshape(hp, wp))

    # --- recomposition: identical association order to the kernel -------
    def compose(_):
        chans = []
        for c in range(4):
            acc = None
            for kx in range(max_depth):
                if kx < nsl:
                    stat = sinfo[kx] & 3
                    shad = (stat == 1) | ((stat == 2) & (occ_lvl[kx] != 0))
                    term = jnp.where(shad, cs[kx][c], cl[kx][c])
                else:
                    term = cl[kx][c]
                acc = term if acc is None else acc + term
            chans.append(acc)
        return tuple(chans)

    def fallback(_):
        kernel = functools.partial(
            _frame_kernel, tuple(geoms), clusters, step_budgets,
            cull_backface, tuple(order) if order is not None else None,
            max_depth, width, height, plane_gid, m, material_ids,
            None, None, False, False, False,
            tuple(tri_offsets) if tri_rows is not None else None,
        )
        fouts = [jax.ShapeDtypeStruct((hp, wp), f32, **vkw) for _ in range(4)]
        return tuple(pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=smem_specs,
            out_specs=[tile_spec] * 4,
            out_shape=fouts,
            scratch_shapes=_frame_scratch(tr, tc, geoms),
            interpret=interpret,
        )(*smem_args))

    total_count = sum(counts)
    ok = jnp.all(jnp.stack([cc <= cap for cc in counts]))
    r, gc, b, a = jax.lax.cond(ok, compose, fallback, None)
    img = jnp.stack(
        [r[:lh, :width], gc[:lh, :width], b[:lh, :width],
         a[:lh, :width]], axis=-1,
    )
    if debug_count:
        return img, total_count
    return img


def pack_frame_params(scene, aspect_unused=None):
    """SMEM parameter blocks for the fused kernel from a Scene."""
    arrays = scene.arrays
    layout = scene.layout
    elapsed = arrays.constants.elapsed_time
    b2l_rows, l2b_rot, step_scales, aabbs, mb_params = scene_kernel.pack_params(
        arrays, elapsed
    )
    mats = arrays.materials
    materials = jnp.stack(
        [
            mats.albedo[:, 0], mats.albedo[:, 1], mats.albedo[:, 2],
            mats.albedo[:, 3],
            mats.reflectance_coefficient, mats.diffuse_coefficient,
            mats.specular_coefficient, mats.specular_power,
        ],
        axis=-1,
    )
    c = arrays.constants
    pad = jnp.zeros((), jnp.float32)

    def row4(*vals):
        vals = list(vals) + [pad] * (4 - len(vals))
        return jnp.stack([jnp.asarray(v, jnp.float32) for v in vals])

    cvec = jnp.stack([
        row4(c.camera_position[0], c.camera_position[1], c.camera_position[2]),
        row4(c.light_position[0], c.light_position[1], c.light_position[2]),
        row4(*[c.light_ambient_color[i] for i in range(4)]),
        row4(*[c.light_diffuse_color[i] for i in range(4)]),
        row4(arrays.blas_offset[0], arrays.blas_offset[1], arrays.blas_offset[2]),
        # Plane-less scenes pack an IMPOSSIBLE rect (size -1): _plane_test's
        # `px <= po_x + ps_x` is then statically unsatisfiable, so the
        # ~10-flop closed-form test runs dead instead of gating fused
        # eligibility on has_plane (VERDICT r3 missing #4 / next #8).
        row4(arrays.plane_origin[0], arrays.plane_origin[1],
             arrays.plane_origin[2]) if layout.has_plane else row4(),
        row4(arrays.plane_size[0], arrays.plane_size[1])
        if layout.has_plane else row4(-1.0, -1.0),
        row4(),
    ])
    p2w = jnp.asarray(c.projection_to_world, jnp.float32).reshape(4, 4)
    geoms = tuple(
        (int(k), int(p)) for k, p in zip(layout.kinds, layout.prim_types)
    )
    from gpuraytracer_tpu.accel.traverse import pack_tri_rows

    tri_rows, tri_offsets = pack_tri_rows(arrays)
    args = (b2l_rows, l2b_rot, step_scales, aabbs, mb_params, materials,
            p2w, cvec)
    if tri_rows is not None:
        args = args + (tri_rows,)
    return (
        args,
        dict(
            geoms=geoms,
            clusters=layout.clusters,
            step_budgets=layout.step_budgets,
            order=layout.traversal_order,
            plane_gid=int(layout.plane_geometry_id),
            material_ids=layout.material_ids,
            tri_offsets=tri_offsets,
        ),
    )


def fused_eligible_layout(layout, num_materials: int | None = None,
                          total_mesh_faces: int = 0) -> bool:
    """Layout-level fused-kernel eligibility (no arrays needed — the
    sharded renderer probes this before tracing)."""
    from gpuraytracer_tpu.accel.traverse import TRI_FACE_TOTAL_CAP
    from gpuraytracer_tpu.kernels import megakernel

    supported = (
        IntersectorKind.ANALYTIC,
        IntersectorKind.VOLUMETRIC,
        IntersectorKind.SIGNED_DISTANCE,
        IntersectorKind.TRIANGLE,
    )
    if num_materials is None:
        if layout.material_ids is not None:
            num_materials = max(layout.material_ids) + 1
        else:
            num_materials = len(layout.kinds) + (1 if layout.has_plane else 0)
    # No has_plane requirement: plane-less scenes pack an impossible
    # plane rect (pack_frame_params) and keep the fused fast path.
    return (
        megakernel.pallas_available()
        and not os.environ.get("GPURT_DISABLE_FUSED")
        and layout.num_procedural > 0
        and all(k in supported for k in layout.kinds)
        and num_materials <= 16
        and total_mesh_faces <= TRI_FACE_TOTAL_CAP
    )


def fused_eligible(scene, origins_ndim: int = 3) -> bool:
    """The fused kernel covers the pass-based TPU path's domain: 2-D pixel
    wavefronts, plane present, every geometry a supported procedural kind
    (incl. small triangle meshes — SMEM Möller–Trumbore), small material
    table (select chains)."""
    from gpuraytracer_tpu.accel.traverse import _total_mesh_faces

    return fused_eligible_layout(
        scene.layout, scene.arrays.materials.albedo.shape[0],
        _total_mesh_faces(scene),
    )
