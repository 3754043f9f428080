"""Extended distance-estimated fractals: Mandelbulb and quaternion Julia.

The reference ships one fractal (the Sierpinski-style pyramid,
SignedDistanceFractals.hlsli:34-63, reproduced in sdf.sd_fractal_pyramid).
BASELINE.json config #5 calls for a "Mandelbulb/Julia quaternion scene",
so the framework extends the SDF registry with the two classic
distance-estimated fractals (standard public formulas: triplex power-8
Mandelbulb and quaternion z^2+c Julia with running-derivative DE).

These are EXTENSIONS beyond the reference feature set; they plug into the
same sphere-trace intersector and scene-builder machinery as every other
signed-distance primitive.
"""

from __future__ import annotations

import enum

import jax
import jax.numpy as jnp

from gpuraytracer_tpu.core import hlsl


class ExtendedSignedDistancePrimitive(enum.IntEnum):
    """Extended type codes, continuing after SignedDistancePrimitive
    (0..6 in ConstantBuffers.h:163-178)."""

    MANDELBULB = 7
    JULIA_QUATERNION = 8


MANDELBULB_ITERATIONS = 8
MANDELBULB_POWER = 8.0
MANDELBULB_BAILOUT = 2.0

JULIA_ITERATIONS = 11
# A visually pleasing, connected Julia set constant.
JULIA_C = (-0.2, 0.6, 0.2, 0.2)


def distance_mandelbulb(p):
    """Power-8 triplex Mandelbulb distance estimate, scaled to live inside
    the unit AABB (the bulb has radius ~1.2, so positions scale by 1.2).

    DE = 0.5 * log(r) * r / dr with the scalar running derivative
    dr <- power * r^(power-1) * dr + 1.
    """
    scale = 1.2
    pos = p * scale

    def body(_, state):
        z, dr, escaped = state
        r = hlsl.length(z)
        r = jnp.maximum(r, 1e-9)
        esc_now = r > MANDELBULB_BAILOUT
        escaped = escaped | esc_now
        frozen = escaped

        theta = jnp.arccos(jnp.clip(z[..., 2] / r, -1.0, 1.0))
        phi = jnp.arctan2(z[..., 1], z[..., 0])
        dr_new = (
            jnp.power(r, MANDELBULB_POWER - 1.0) * MANDELBULB_POWER * dr + 1.0
        )
        zr = jnp.power(r, MANDELBULB_POWER)
        theta = theta * MANDELBULB_POWER
        phi = phi * MANDELBULB_POWER
        st = jnp.sin(theta)
        z_new = zr[..., None] * hlsl.vec3(
            st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)
        ) + pos

        z = jnp.where(frozen[..., None], z, z_new)
        dr = jnp.where(frozen, dr, dr_new)
        return z, dr, escaped

    z0 = pos
    dr0 = jnp.ones(pos.shape[:-1], dtype=pos.dtype)
    escaped0 = jnp.zeros(pos.shape[:-1], dtype=bool)
    z, dr, _ = jax.lax.fori_loop(0, MANDELBULB_ITERATIONS, body, (z0, dr0, escaped0))

    r = jnp.maximum(hlsl.length(z), 1e-9)
    de = 0.5 * jnp.log(r) * r / dr
    return de / scale


def _quat_mul(a, b):
    """Hamilton product over trailing-axis-4 quaternions (w, x, y, z)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def distance_julia_quaternion(p, c=JULIA_C):
    """Quaternion Julia set z <- z^2 + c on the w=0 slice, DE =
    0.5 * |z| * log|z| / |dz| with the quaternion running derivative
    dz <- 2 z dz. Scaled to sit inside the unit AABB."""
    scale = 1.1
    pos = p * scale
    c = jnp.asarray(c, dtype=p.dtype)

    z0 = jnp.concatenate([pos, jnp.zeros(pos.shape[:-1] + (1,), dtype=p.dtype)], axis=-1)
    dz0 = jnp.concatenate(
        [
            jnp.ones(pos.shape[:-1] + (1,), dtype=p.dtype),
            jnp.zeros(pos.shape[:-1] + (3,), dtype=p.dtype),
        ],
        axis=-1,
    )
    escaped0 = jnp.zeros(pos.shape[:-1], dtype=bool)

    def body(_, state):
        z, dz, escaped = state
        m2 = hlsl.dot(z, z)
        esc_now = m2 > 16.0
        escaped = escaped | esc_now
        frozen = escaped
        dz_new = 2.0 * _quat_mul(z, dz)
        z_new = _quat_mul(z, z) + c
        z = jnp.where(frozen[..., None], z, z_new)
        dz = jnp.where(frozen[..., None], dz, dz_new)
        return z, dz, escaped

    z, dz, escaped = jax.lax.fori_loop(
        0, JULIA_ITERATIONS, body, (z0, dz0, escaped0)
    )

    mz = jnp.maximum(hlsl.length(z), 1e-9)
    mdz = jnp.maximum(hlsl.length(dz), 1e-6)
    de = 0.5 * mz * jnp.log(mz) / mdz
    # Non-escaping points lie in the filled Julia set; the DE formula
    # degenerates there (|dz| can collapse), so report a small negative
    # distance — "just inside" — which the sphere tracer treats as a hit
    # without taking an explosive negative step.
    return jnp.where(escaped, de, -1e-3) / scale


def register():
    """Install the extended fractals into the SDF dispatch table."""
    from gpuraytracer_tpu.geometry import sdf

    sdf.DISTANCE_FUNCTIONS[int(ExtendedSignedDistancePrimitive.MANDELBULB)] = (
        distance_mandelbulb
    )
    sdf.DISTANCE_FUNCTIONS[int(ExtendedSignedDistancePrimitive.JULIA_QUATERNION)] = (
        distance_julia_quaternion
    )


register()
