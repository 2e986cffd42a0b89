"""Test configuration: run everything on a virtual 8-device CPU mesh.

Multi-device tests don't need a real TPU slice — JAX's host platform can
expose N virtual CPU devices (SURVEY.md §4). The flags must be in place
before the JAX backends initialize, so this conftest sets them at import
time, before any test module imports jax.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "--xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon TPU plugin (when present) pins jax_platforms; override to CPU for
# the unit-test suite. x64 gives the SciPy-parity working precision.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(1234)
