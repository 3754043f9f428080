"""Debug mode — the D3D12 debug-layer / break-on-error analog.

The reference runs the D3D12/DXGI debug layers with break-on-severity as
its runtime sanitizer (DeviceResources.cpp:67-100,144-164; SURVEY.md §5
"Race detection / sanitizers"). The JAX equivalents:
  - jax_debug_nans: trap on the first NaN-producing op
  - checkify wrapping: turn device-side invariant violations into errors
  - a frame validator asserting renderer output invariants
"""

from __future__ import annotations

import contextlib
from typing import Callable

import jax
import jax.numpy as jnp
from jax.experimental import checkify


@contextlib.contextmanager
def debug_layer(nan_checks: bool = True):
    """Enable break-on-error style checking for the enclosed scope."""
    prev = jax.config.jax_debug_nans
    try:
        jax.config.update("jax_debug_nans", nan_checks)
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checked(fn: Callable, *, errors=checkify.float_checks) -> Callable:
    """Wrap a jittable function with checkify; the wrapper raises on the
    first device-side error instead of silently propagating garbage."""
    checked_fn = checkify.checkify(fn, errors=errors)

    def wrapper(*args, **kwargs):
        err, out = checked_fn(*args, **kwargs)
        err.throw()
        return out

    return wrapper


def validate_frame(image) -> None:
    """Assert renderer output invariants (the live-object/leak report
    analog): finite values, non-negative radiance, plausible shape."""
    arr = jnp.asarray(image)
    if arr.ndim != 3 or arr.shape[-1] != 4:
        raise AssertionError(f"framebuffer must be (H, W, 4), got {arr.shape}")
    if not bool(jnp.isfinite(arr).all()):
        raise AssertionError("framebuffer contains non-finite values")
    if bool((arr < 0).any()):
        raise AssertionError("framebuffer contains negative radiance")
