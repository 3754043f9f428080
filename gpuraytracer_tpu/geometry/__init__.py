from gpuraytracer_tpu.geometry import analytic, metaballs, registry, sdf

__all__ = ["analytic", "metaballs", "registry", "sdf"]
