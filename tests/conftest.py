"""Test harness: run everything on a virtual 8-device CPU mesh.

JAX reads JAX_PLATFORMS / XLA_FLAGS at *backend init* (first device
use), not at import, so forcing them here works even if a pytest plugin
imported jax already — as long as no test ran yet.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# belt and braces: the env route fails if a plugin imported jax first and
# the config already latched (e.g. an axon TPU plugin); the config route
# still works until the backend actually initializes.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh; a backend was initialized "
    "before conftest could force JAX_PLATFORMS=cpu")
assert jax.device_count() == 8


@pytest.fixture()
def rng():
    # function-scoped on purpose: a session-scoped RandomState is a
    # single shared stream, so every test's data silently depends on
    # which tests ran before it (adding one rng-consuming test flipped
    # an unrelated tolerance test). Each test gets the same fresh
    # deterministic stream no matter the suite order.
    return np.random.RandomState(0)
