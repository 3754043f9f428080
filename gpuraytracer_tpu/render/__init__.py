from gpuraytracer_tpu.render import checkers, shade, trace

__all__ = ["checkers", "shade", "trace"]
