from gpuraytracer_tpu.utils import log, png, stats, timers

__all__ = ["log", "png", "stats", "timers"]
