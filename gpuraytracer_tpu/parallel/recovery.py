"""Failure detection & recovery — the device-removed handling analog.

The reference detects DXGI_ERROR_DEVICE_REMOVED on Present, tears down all
device objects and recreates them via IDeviceNotify callbacks
(DeviceResources.cpp:465-509,575-585; Renderer.cpp:184-195). The TPU
analog: catch device/runtime errors from a step, invoke on_device_lost /
on_device_restored hooks, rebuild the jitted function (dropping poisoned
executables/buffers), and retry with bounded attempts.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax

from gpuraytracer_tpu.utils.log import get_logger

log = get_logger("recovery")

# Error types indicating the device/runtime died rather than a programming
# bug (the DEVICE_REMOVED vs E_INVALIDARG distinction).
_DEVICE_ERRORS = (jax.errors.JaxRuntimeError,)


class DeviceLostError(RuntimeError):
    pass


class RecoveringExecutor:
    """Runs a step function with device-lost detection and re-create/retry.

    make_step: builds a fresh jitted step (called at init and after every
    device loss — the create_device_dependent_resources analog).
    """

    def __init__(
        self,
        make_step: Callable[[], Callable],
        max_retries: int = 2,
        retry_delay_seconds: float = 5.0,
        on_device_lost: Optional[Callable[[], None]] = None,
        on_device_restored: Optional[Callable[[], None]] = None,
    ):
        self._make_step = make_step
        self._max_retries = max_retries
        self._retry_delay = retry_delay_seconds
        self._on_lost = on_device_lost
        self._on_restored = on_device_restored
        self._step = make_step()
        self.recoveries = 0

    def __call__(self, *args, **kwargs):
        attempt = 0
        while True:
            try:
                out = self._step(*args, **kwargs)
                # Surface asynchronous device faults here rather than at an
                # arbitrary later use (the Present-time check analog).
                jax.block_until_ready(out)
                return out
            except _DEVICE_ERRORS as e:
                attempt += 1
                if attempt > self._max_retries:
                    raise DeviceLostError(
                        f"device error persisted after {self._max_retries} retries"
                    ) from e
                log.warning(
                    "device error (%s); recovery attempt %d/%d",
                    type(e).__name__, attempt, self._max_retries,
                )
                if self._on_lost:
                    self._on_lost()
                jax.clear_caches()
                time.sleep(self._retry_delay)
                self._step = self._make_step()
                if self._on_restored:
                    self._on_restored()
                self.recoveries += 1
