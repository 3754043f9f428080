"""Multi-chip rendering: pixel-grid data parallelism over a device mesh.

The reference's only parallelism is the implicit SIMT width of
DispatchRays(W, H, 1) on one GPU (SURVEY.md §2.14). The TPU-native scale-out
is data parallelism over pixels: shard the pixel rows across a 1-D mesh
under shard_map — each chip renders a horizontal band, collectives ride
ICI. Rendering is embarrassingly parallel; the only cross-chip traffic is
the optional frame-stats psum and the output gather (left to jax's global
array machinery unless `gather_output` forces an explicit all_gather).
"""

from __future__ import annotations

from functools import partial
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gpuraytracer_tpu.accel.instances import Scene, SceneLayout
from gpuraytracer_tpu.core import camera as cam
from gpuraytracer_tpu.render.trace import trace_radiance

try:  # jax >= 0.4.35 exposes shard_map at top level
    from jax import shard_map as _shard_map_fn

    def shard_map(f, *, mesh, in_specs, out_specs, check_vma=True):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_vma)

except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map_fn

    def shard_map(f, *, mesh, in_specs, out_specs, check_vma=True):
        return _shard_map_fn(f, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_vma=check_vma)


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "x") -> Mesh:
    """1-D render mesh. For the builtin workload the natural mesh is all
    chips on one axis; pixel rows shard across it."""
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis_name,))


def make_sharded_renderer(
    layout: SceneLayout,
    width: int,
    height: int,
    mesh: Mesh,
    *,
    axis_name: str = "x",
    max_depth: int = 3,
    compute_stats: bool = False,
    use_fused: bool | None = None,
    interpret: bool = False,
):
    """jit-compiled multi-chip frame function.

    Each device traces its band of pixel rows; `height` must divide evenly
    by the mesh size (pad upstream if needed). Returns image (H, W, 4) laid
    out row-sharded across the mesh; with compute_stats also returns the
    mean radiance (psum over ICI — the cross-chip metrics reduction).

    use_fused: None routes through the fused frame megakernel exactly when
    the single-chip path would (kernels/frame_kernel.fused_eligible);
    True/False forces it (True + interpret=True exercises the Pallas
    kernels under shard_map on the CPU backend — tests/test_sharding.py).
    Each device runs the SAME fused kernel on its band: cvec[7,0] carries
    the band's global row offset into the in-kernel raygen, so the fused
    fast path — including the compacted two-round form — is the multi-chip
    path, not a single-chip special case.
    """
    from gpuraytracer_tpu.kernels import frame_kernel

    n = mesh.devices.size
    if height % n != 0:
        raise ValueError(f"height {height} not divisible by mesh size {n}")
    local_h = height // n

    def tile_fused(px, py, arrays):
        scene = Scene(layout, arrays)
        smem_args, kw = frame_kernel.pack_frame_params(scene)
        row_off = (jax.lax.axis_index(axis_name) * local_h).astype(jnp.float32)
        cvec = smem_args[7].at[7, 0].set(row_off)  # cvec is arg 7 (tri may follow)
        smem_args = smem_args[:7] + (cvec,) + smem_args[8:]
        render_fn = (
            frame_kernel.render_frame_compact
            if frame_kernel.compact_enabled()
            else frame_kernel.render_frame_tiles
        )
        color = render_fn(
            *smem_args, width=width, height=height, max_depth=max_depth,
            cull_backface=True, local_height=local_h, interpret=interpret,
            **kw,
        )
        if compute_stats:
            local_sum = jnp.sum(color[..., :3])
            total = jax.lax.psum(local_sum, axis_name)
            return color, total / (width * height * 3)
        return color

    def tile(px, py, arrays):
        scene = Scene(layout, arrays)
        origins, directions = cam.generate_camera_rays(
            px, py, width, height,
            arrays.constants.camera_position,
            arrays.constants.projection_to_world,
        )
        color = trace_radiance(
            origins, directions, px, py, width, height, scene,
            max_depth=max_depth,
        )
        if compute_stats:
            local_sum = jnp.sum(color[..., :3])
            total = jax.lax.psum(local_sum, axis_name)
            return color, total / (width * height * 3)
        return color

    fused = use_fused
    if fused is None:
        fused = frame_kernel.fused_eligible_layout(layout)

    # interpret-mode Pallas does not propagate varying-manual-axes into the
    # kernel jaxpr (a jax hlo_interpreter limitation: even `ref[:] * 2.0`
    # fails the vma check), so interpret runs — the CPU validation mode —
    # relax the check. Real-TPU (Mosaic) runs keep strict vma: the kernels
    # declare their varying outputs (frame_kernel/scene_kernel vkw).
    sharded = shard_map(
        tile_fused if fused else tile,
        mesh=mesh,
        in_specs=(P(axis_name, None), P(axis_name, None), P()),
        out_specs=(P(axis_name, None, None), P()) if compute_stats else P(axis_name, None, None),
        check_vma=not (fused and interpret),
    )

    px, py = cam.pixel_grid(width, height)
    row_sharding = NamedSharding(mesh, P(axis_name, None))
    px = jax.device_put(px, row_sharding)
    py = jax.device_put(py, row_sharding)

    @jax.jit
    def render(arrays):
        return sharded(px, py, arrays)

    return render


def gather_image(image) -> np.ndarray:
    """Assemble the row-sharded global array on the host."""
    return np.asarray(jax.device_get(image))
