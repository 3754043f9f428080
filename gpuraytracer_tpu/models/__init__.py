from gpuraytracer_tpu.models import animate, builtin

__all__ = ["animate", "builtin"]
