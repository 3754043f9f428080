"""HLSL-semantics math helpers over jax.numpy.

The rendering algorithms reproduced by this framework were specified in HLSL
(reference: src/RaytracingShaderHelper.hlsli, src/SignedDistancePrimitives.hlsli).
Several HLSL intrinsics differ subtly from the numpy defaults — most
importantly ``fmod`` (sign follows the dividend, i.e. trunc-division
remainder, NOT python/jnp ``mod``) — so every algorithm in geometry/ and
render/ goes through this module instead of calling jnp directly for the
semantically loaded ops.

All functions are shape-polymorphic and jit-safe (pure, no python branching
on traced values).
"""

from __future__ import annotations

import jax.numpy as jnp

# Matches HLSL's INFINITY idiom `1.0/0.0` (reference: RaytracingShaderHelper.hlsli:17).
INFINITY = float("inf")


def fmod(x, y):
    """HLSL fmod: x - y * trunc(x / y); result sign follows the dividend.

    jnp.fmod has exactly these semantics (unlike jnp.mod / the % operator,
    whose result sign follows the divisor). Kept as a named wrapper so call
    sites read like the HLSL they reproduce.
    """
    return jnp.fmod(x, y)


def saturate(x):
    """HLSL saturate: clamp to [0, 1]."""
    return jnp.clip(x, 0.0, 1.0)


def lerp(a, b, t):
    """HLSL lerp: a + t*(b-a). Computed exactly in that form."""
    return a + t * (b - a)


def frac(x):
    """HLSL frac: x - floor(x). Always in [0, 1)."""
    return x - jnp.floor(x)


def smoothstep(edge0, edge1, x):
    """HLSL smoothstep with the standard 3t^2-2t^3 cubic."""
    t = saturate((x - edge0) / (edge1 - edge0))
    return t * t * (3.0 - 2.0 * t)


def clamp(x, lo, hi):
    return jnp.clip(x, lo, hi)


def dot(a, b, axis=-1, keepdims=False):
    """Vector dot over the trailing axis (SoA-friendly)."""
    return jnp.sum(a * b, axis=axis, keepdims=keepdims)


def length(v, axis=-1, keepdims=False):
    return jnp.sqrt(dot(v, v, axis=axis, keepdims=keepdims))


def length_sq(v, axis=-1, keepdims=False):
    """HLSL helper length_toPow2 (reference: RaytracingShaderHelper.hlsli:25-33)."""
    return dot(v, v, axis=axis, keepdims=keepdims)


def normalize(v, axis=-1):
    """HLSL normalize: v / length(v), with an exact-zero guard: a zero
    vector normalizes to zero instead of NaN (bitwise identical for any
    |v| >= 1e-18, far below every real normal/direction in this
    framework; degenerate gradients occur only inside the extension DE
    fractals)."""
    return v / jnp.maximum(length(v, axis=axis, keepdims=True), 1e-20)


def reflect(i, n):
    """HLSL reflect: i - 2 * dot(i, n) * n."""
    return i - 2.0 * dot(i, n, keepdims=True) * n


def cross(a, b):
    return jnp.cross(a, b)


def vec3(x, y, z):
    """Stack three same-shaped arrays into a trailing-axis-3 vector."""
    return jnp.stack(jnp.broadcast_arrays(x, y, z), axis=-1)


def vec4(x, y, z, w):
    return jnp.stack(jnp.broadcast_arrays(x, y, z, w), axis=-1)


def calculate_animation_interpolant(elapsed_time, cycle_duration):
    """Cycling 0 -> 1 -> 0 animation interpolant, smoothstepped.

    Reference: RaytracingShaderHelper.hlsli:36-41 (CalculateAnimationInterpolant).
    Drives the metaball keyframe animation with a 12 s cycle.
    """
    t = fmod(elapsed_time, cycle_duration) / cycle_duration
    t = jnp.where(t <= 0.5, 2.0 * t, 1.0 - 2.0 * (t - 0.5))
    return smoothstep(0.0, 1.0, t)
