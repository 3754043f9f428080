from gpuraytracer_tpu.accel import instances, traverse

__all__ = ["instances", "traverse"]
