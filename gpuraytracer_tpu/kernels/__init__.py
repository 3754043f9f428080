from gpuraytracer_tpu.kernels import megakernel, scene_kernel, soa

__all__ = ["megakernel", "scene_kernel", "soa"]
