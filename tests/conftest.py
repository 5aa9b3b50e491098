"""Test configuration: force the CPU backend with a virtual 8-device mesh.

The axon sitecustomize pins JAX_PLATFORMS=axon (one real TPU behind a slow
tunnel); tests must run on CPU. jax.config.update('jax_platforms', ...) wins
as long as no backend has been initialized yet, and XLA_FLAGS must be set
before first device use to get 8 virtual CPU devices for sharding tests.
"""
import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(20260817)
