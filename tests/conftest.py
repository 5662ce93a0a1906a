"""Test configuration: force an 8-device virtual CPU platform BEFORE jax
initializes its backends, so sharding/pjit paths are exercised without TPU
hardware (and without the axon TPU tunnel, whose remote compiles make the
suite orders of magnitude slower).

Note: the image's sitecustomize registers the 'axon' TPU backend and sets
JAX_PLATFORMS=axon before any conftest runs, so an env setdefault is not
enough — the platform must be overridden through jax.config after import.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)


def pytest_configure(config):
    config.addinivalue_line("markers", "slow: long-running integration test")
