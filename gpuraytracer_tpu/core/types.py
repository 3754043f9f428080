"""Scene/constants ABI — the one layout preserved from the reference.

Mirrors the shared C++/HLSL structs and enums in the reference's
src/ConstantBuffers.h and src/RaytracingSceneDefines.h, field for field,
so scenes specified against the reference render identically. Host-side
these are frozen dataclasses of jnp arrays (registered as pytrees); on
device they travel as struct-of-arrays.

Reference anchors:
  SceneConstantBuffer            ConstantBuffers.h:49-58
  PrimitiveConstantBuffer        ConstantBuffers.h:61-71
  PrimitiveInstanceConstantBuffer ConstantBuffers.h:74-78
  PrimitiveInstancePerFrameBuffer ConstantBuffers.h:81-85
  RayType / primitive enums      ConstantBuffers.h:94-178
  IntersectionShaderType totals  RaytracingSceneDefines.h:113-143
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Any

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Global compile-time constants (ConstantBuffers.h:12-31, 135-138)
# ---------------------------------------------------------------------------

METABALLS_COUNT = 3
FRACTAL_ITERATIONS_COUNT = 4
MAX_RAY_RECURSION_DEPTH = 3  # primary + reflection + shadows from reflected geometry

CHROMIUM_REFLECTANCE = (0.549, 0.556, 0.554, 1.0)
BACKGROUND_COLOR = (0.8, 0.9, 1.0, 1.0)
IN_SHADOW_RADIANCE = 0.35

# Radiance-ray extents (Raytracing.hlsl:100-101).
RAY_TMIN = 0.0
RAY_TMAX = 10000.0

# SDF sphere-trace parameters (SignedDistancePrimitives.hlsli:289-291).
SDF_HIT_THRESHOLD = 0.0001  # relative: hit when distance <= threshold * t
SDF_MAX_STEPS = 512

# Metaball march parameters (VolumetricPrimitives.hlsli:160-185).
METABALL_MAX_STEPS = 128
METABALL_ISO_THRESHOLD = 0.25
METABALL_CYCLE_DURATION = 12.0

# Reflection contribution cutoff (Raytracing.hlsl:199,234).
REFLECTANCE_EPS = 0.001


class RayType(enum.IntEnum):
    """ConstantBuffers.h:94-104."""

    RADIANCE = 0
    SHADOW = 1


class AnalyticPrimitive(enum.IntEnum):
    """ConstantBuffers.h:140-150."""

    AABB = 0
    SPHERES = 1


class VolumetricPrimitive(enum.IntEnum):
    """ConstantBuffers.h:152-161."""

    METABALLS = 0


class SignedDistancePrimitive(enum.IntEnum):
    """ConstantBuffers.h:163-178."""

    MINI_SPHERES = 0
    INTERSECTED_ROUND_CUBE = 1
    SQUARE_TORUS = 2
    TWISTED_TORUS = 3
    COG = 4
    CYLINDER = 5
    FRACTAL_PYRAMID = 6


class IntersectorKind(enum.IntEnum):
    """Which intersection kernel a geometry dispatches to — the analog of the
    three DXR intersection shaders (Renderer.cpp:33-36, RaytracingSceneDefines.h:113-130)."""

    ANALYTIC = 0
    VOLUMETRIC = 1
    SIGNED_DISTANCE = 2
    TRIANGLE = 3  # plane geometry; handled by the triangle path, kept for registry completeness


ANALYTIC_PRIMITIVE_COUNT = len(AnalyticPrimitive)
VOLUMETRIC_PRIMITIVE_COUNT = len(VolumetricPrimitive)
SDF_PRIMITIVE_COUNT = len(SignedDistancePrimitive)
# RaytracingSceneDefines.h:140-142: TOTAL_PRIMITIVE_COUNT = 2 + 1 + 7 = 10.
TOTAL_PRIMITIVE_COUNT = (
    ANALYTIC_PRIMITIVE_COUNT + VOLUMETRIC_PRIMITIVE_COUNT + SDF_PRIMITIVE_COUNT
)


def _pytree_dataclass(cls):
    """Register a frozen dataclass as a JAX pytree (all fields are leaves)."""
    fields = [f.name for f in dataclasses.fields(cls)]

    def flatten(obj):
        return tuple(getattr(obj, n) for n in fields), None

    def unflatten(_, leaves):
        return cls(*leaves)

    jax.tree_util.register_pytree_node(cls, flatten, unflatten)
    return cls


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class SceneConstants:
    """SceneConstantBuffer (ConstantBuffers.h:49-58).

    projection_to_world is the DirectX row-vector-convention inverse
    view-projection matrix: world = [sx, sy, 0, 1] @ projection_to_world.
    """

    projection_to_world: Any  # (4, 4) f32
    camera_position: Any  # (4,) f32
    light_position: Any  # (4,) f32
    light_ambient_color: Any  # (4,) f32
    light_diffuse_color: Any  # (4,) f32
    reflectance: Any  # scalar f32 (unused by the shader core; kept for ABI parity)
    elapsed_time: Any  # scalar f32


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class MaterialTable:
    """Struct-of-arrays PrimitiveConstantBuffer (ConstantBuffers.h:61-71).

    One row per geometry. In the reference each material rides in a shader
    record's local root arguments; here the table is indexed by geometry id —
    the shader-binding-table analog.
    """

    albedo: Any  # (G, 4)
    reflectance_coefficient: Any  # (G,)
    diffuse_coefficient: Any  # (G,)
    specular_coefficient: Any  # (G,)
    specular_power: Any  # (G,)
    step_scale: Any  # (G,)

    def row(self, g: int) -> "MaterialTable":
        return MaterialTable(
            albedo=self.albedo[g],
            reflectance_coefficient=self.reflectance_coefficient[g],
            diffuse_coefficient=self.diffuse_coefficient[g],
            specular_coefficient=self.specular_coefficient[g],
            specular_power=self.specular_power[g],
            step_scale=self.step_scale[g],
        )


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class InstanceTransforms:
    """Struct-of-arrays PrimitiveInstancePerFrameBuffer (ConstantBuffers.h:81-85).

    Column-vector-convention 4x4 matrices (transposes of the reference's
    row-vector DirectXMath matrices — same transforms, idiomatic orientation):
      local_to_blas: p_blas = M @ [p_local, 1]
      blas_to_local: p_local = M @ [p_blas, 1]
    Rebuilt every frame by models/animate.py from the animation time.
    """

    local_to_blas: Any  # (P, 4, 4)
    blas_to_local: Any  # (P, 4, 4)


@_pytree_dataclass
@dataclasses.dataclass(frozen=True)
class HitRecord:
    """Result of a closest-hit query over the whole scene (the RayPayload
    + intersection-attribute analog, ConstantBuffers.h:33-47)."""

    t: Any  # (N,) world-space hit distance (RAY_TMAX where miss)
    normal: Any  # (N, 3) world-space surface normal
    geometry_id: Any  # (N,) int32; index into material table; -1 on miss
    hit: Any  # (N,) bool


def make_scene_constants(
    projection_to_world,
    camera_position,
    light_position,
    light_ambient_color,
    light_diffuse_color,
    reflectance=0.0,
    elapsed_time=0.0,
) -> SceneConstants:
    f32 = lambda x: jnp.asarray(x, dtype=jnp.float32)
    return SceneConstants(
        projection_to_world=f32(projection_to_world),
        camera_position=f32(camera_position),
        light_position=f32(light_position),
        light_ambient_color=f32(light_ambient_color),
        light_diffuse_color=f32(light_diffuse_color),
        reflectance=f32(reflectance),
        elapsed_time=f32(elapsed_time),
    )
