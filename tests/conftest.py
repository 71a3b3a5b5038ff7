"""Test harness config: run JAX on CPU with 8 virtual devices.

Must set env before the first jax import (SURVEY §4.5): the virtual 8-device
CPU mesh lets distributed tests (tile sharding, psum'd grads) run without TPU
hardware.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# Some images preload jax at interpreter start (plugin sitecustomize), making
# the env var above a no-op; backends initialize lazily, so the config update
# below still wins as long as no test imported jax.devices() yet.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compile cache: the suite compiles hundreds of programs; reuse
# across runs makes re-runs much faster and skips most LLVM compiles.
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _clear_jax_caches_per_module():
    """Free compiled executables between test modules.

    A full-suite run accumulates hundreds of live XLA:CPU executables in
    one process; round 5 saw an intermittent SIGSEGV inside LLVM's
    backend_compile near the END of the suite (the same program compiles
    fine in isolation) — bounding in-process accumulation removes the
    conditions for it, and the persistent cache keeps the extra
    recompiles cheap."""
    yield
    jax.clear_caches()


@pytest.fixture(scope="session")
def box_scene():
    from dpt_tpu import cornell_box_scene

    return cornell_box_scene()


@pytest.fixture(scope="session")
def default_camera():
    from dpt_tpu import OrbitCamera

    return OrbitCamera().camera()


@pytest.fixture(scope="session")
def moved_camera():
    from dpt_tpu import OrbitCamera

    return OrbitCamera().view_update(120.0, -60.0).zoom_update(0.9).camera()
