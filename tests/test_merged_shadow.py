"""Merged occlusion march (scene_kernel._march_sdf_multi).

The merged form runs every SDF geometry's occlusion march in ONE while
loop (per-geometry VMEM state banks under pl.when sections) and kills all
of a lane's marches the moment any geometry registers a valid hit — the
accept-first end-of-search (Raytracing.hlsl:115-146). Each geometry's
step sequence is bit-identical to the sequential marches, so the rendered
image must be EXACTLY equal, which these tests pin per scene class
(plain reference stepping, relaxed/AABB-windowed extensions, clustered
layouts).
"""

import numpy as np
import pytest

from gpuraytracer_tpu.kernels import frame_kernel, scene_kernel
from gpuraytracer_tpu.models import builtin
from gpuraytracer_tpu.models.scenes import get_config

W, H = 64, 36


def _render(scene, max_depth, merged):
    old = scene_kernel.MERGED_SHADOW
    scene_kernel.MERGED_SHADOW = merged
    try:
        smem_args, kw = frame_kernel.pack_frame_params(scene)
        # __wrapped__: bypass jit so the module flag is re-read per call.
        return np.asarray(frame_kernel.render_frame_tiles.__wrapped__(
            *smem_args, width=W, height=H, max_depth=max_depth,
            cull_backface=True, interpret=True, **kw))
    finally:
        scene_kernel.MERGED_SHADOW = old


def test_merged_matches_sequential_builtin():
    # 7 reference SDFs + metaballs + closed forms, clustered layout.
    scene = builtin.build_scene(aspect=W / H, elapsed_time=0.7)
    seq = _render(scene, 3, merged=False)
    mrg = _render(scene, 3, merged=True)
    np.testing.assert_array_equal(seq, mrg)


@pytest.mark.parametrize("name", [
    "fractal_mandelbulb_julia_1080p",  # relaxed + AABB-windowed codes
    "sdf_primitives_720p",             # 7 plain reference SDFs
])
def test_merged_matches_sequential_configs(name):
    cfg = get_config(name)
    scene = cfg.build(W / H, 0.7)
    seq = _render(scene, cfg.max_depth, merged=False)
    mrg = _render(scene, cfg.max_depth, merged=True)
    np.testing.assert_array_equal(seq, mrg)
