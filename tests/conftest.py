"""Test configuration: force CPU with 8 virtual devices so sharding/multi-chip
tests run anywhere, and use exact float32 matmuls for numerical parity tests.

Note: this image sets JAX_PLATFORMS=axon (TPU tunnel) and a sitecustomize that
may import jax early, so the env var alone is not enough — we set the platform
through jax.config after import, which is honored."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
