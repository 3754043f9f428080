"""Frames-in-flight pipeline — the triple-buffered swapchain analog.

The reference keeps <= 3 frames in flight, fence-pacing the CPU against the
GPU (DeviceResources.cpp:770-792, Renderer.h:92). JAX dispatch is already
asynchronous; this pipeline bounds the queue depth exactly like the fence:
submitting frame N+depth blocks until frame N's device work completes, so
host-side animation (the on_update analog) overlaps device rendering.
"""

from __future__ import annotations

import collections
from typing import Any, Callable, Deque, Optional

import jax

DEFAULT_FRAMES_IN_FLIGHT = 3  # Renderer.h:92


class FramePipeline:
    def __init__(self, render_fn: Callable[..., Any], frames_in_flight: int = DEFAULT_FRAMES_IN_FLIGHT):
        if frames_in_flight < 1:
            raise ValueError("frames_in_flight must be >= 1")
        self._render = render_fn
        self._depth = frames_in_flight
        self._inflight: Deque[Any] = collections.deque()

    def submit(self, *args, **kwargs):
        """Dispatch a frame; blocks only when the pipeline is full (the
        move_to_next_frame fence wait). Returns the async result (a jax
        array whose computation may still be running)."""
        out = self._render(*args, **kwargs)
        self._inflight.append(out)
        if len(self._inflight) > self._depth:
            done = self._inflight.popleft()
            jax.block_until_ready(done)
            return out, done
        return out, None

    def drain(self):
        """wait_for_gpu analog (DeviceResources.cpp:605-623): block on all
        outstanding frames and return them oldest-first."""
        done = list(self._inflight)
        self._inflight.clear()
        for d in done:
            jax.block_until_ready(d)
        return done

    @property
    def in_flight(self) -> int:
        return len(self._inflight)
