"""Device selection — the DeviceResources adapter-enumeration analog.

The reference enumerates DXGI adapters preferring high-performance GPUs
with a WARP software-rasterizer fallback in debug builds
(DeviceResources.cpp:794-875). Here: prefer the TPU backend, fall back to
CPU (the software device) so everything runs anywhere; an explicit adapter
override (DeviceResources.cpp:811-845) maps to `device_index`.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax


@dataclasses.dataclass(frozen=True)
class DeviceInfo:
    device: Any
    platform: str  # "tpu" | "cpu" | ...
    is_software: bool  # CPU fallback == the WARP analog
    description: str

    @property
    def id(self) -> int:
        return self.device.id


def available_platforms() -> list[str]:
    platforms = []
    for name in ("tpu", "cpu"):
        try:
            if jax.devices(name):
                platforms.append(name)
        except RuntimeError:
            pass
    return platforms


def pick_device(platform: str = "auto", device_index: int = 0) -> DeviceInfo:
    """platform: "auto" (prefer TPU, fall back to CPU), "tpu", or "cpu".

    Raises RuntimeError if an explicitly requested platform is unavailable —
    the analog of the reference's hard assert on DXR support
    (Renderer.cpp:68).
    """
    order = ("tpu", "cpu") if platform == "auto" else (platform,)
    last_err: Optional[Exception] = None
    for name in order:
        try:
            devices = jax.devices(name)
        except RuntimeError as e:
            last_err = e
            continue
        if not devices:
            continue
        if device_index >= len(devices):
            raise RuntimeError(
                f"device_index {device_index} out of range for platform "
                f"{name!r} ({len(devices)} devices)"
            )
        dev = devices[device_index]
        return DeviceInfo(
            device=dev,
            platform=name,
            is_software=(name == "cpu"),
            description=f"{dev.device_kind} (id {dev.id}, platform {name})",
        )
    raise RuntimeError(f"no usable device for platform={platform!r}: {last_err}")


def device_count(platform: str = "auto") -> int:
    info = pick_device(platform)
    return len(jax.devices(info.platform))
