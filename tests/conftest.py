"""Test configuration: force CPU backend with 8 virtual devices.

Tests must run without TPU hardware; multi-chip sharding paths are validated
on a virtual 8-device CPU mesh (see SURVEY.md §5 "Distributed communication
backend").

The session environment pins ``JAX_PLATFORMS=axon`` (the TPU tunnel) and a
sitecustomize hook imports jax at interpreter start, so mutating ``os.environ``
here is too late for the platform choice — only ``jax.config.update`` works.
``XLA_FLAGS`` is still honored lazily at first backend init, which has not
happened yet when conftest runs.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="session")
def _assert_cpu_backend():
    assert jax.default_backend() == "cpu", "tests must run on the CPU backend"
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(0)
