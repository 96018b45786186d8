"""Test configuration: run everything on a virtual 8-device CPU mesh.

The reference tests every distributed path with real MPI ranks on one machine
(SURVEY.md §4); the honest TPU analogue is XLA's host-platform device
virtualization — 8 CPU devices, so 2x2x2 / 1x2x4 / 8-way meshes are real
multi-device programs with real collectives, just without ICI.

float64 is enabled because the oracle-parity gates (1e-10) require it; f32
perf paths are exercised separately with looser tolerances.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The session environment pre-registers a TPU plugin and pins JAX_PLATFORMS
# to it (overriding the env var hangs its registration hook) — switching the
# platform via jax.config after import is the reliable path to the virtual
# CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
