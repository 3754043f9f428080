"""Test harness configuration.

Tests run on the CPU backend (the WARP-software-device analog,
SURVEY.md §4) with 8 virtual devices so multi-chip sharding paths are
exercised without TPU hardware. A persistent compilation cache keeps the
expensive full-scene closest-hit compiles amortized across test runs.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's sitecustomize may have force-registered a remote TPU
# plugin and overridden jax_platforms at interpreter start; tests must run
# on the local CPU backend regardless (backends are lazy, so this config
# write wins as long as it happens before the first computation).
jax.config.update("jax_platforms", "cpu")

_CACHE_DIR = os.path.join(os.path.dirname(__file__), "..", ".jax_cache")
jax.config.update("jax_compilation_cache_dir", os.path.abspath(_CACHE_DIR))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def builtin_scene():
    from gpuraytracer_tpu.models import builtin

    return builtin.build_scene(aspect=1.0, elapsed_time=0.0)


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(20260816)
