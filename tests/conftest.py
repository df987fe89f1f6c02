"""Test harness config: force the CPU backend with 8 virtual devices so
mesh/sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

# Force CPU even when the environment pins a TPU platform (JAX_PLATFORMS=axon,
# set before interpreter start via sitecustomize): tests exercise mesh logic
# on 8 virtual devices, not real hardware. The config.update below overrides
# the env var even though jax was already imported by the boot hook.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

from primestereomatch_tpu.utils.datasets import load_dataset  # noqa: E402


@pytest.fixture(scope="session")
def teddy():
    return load_dataset("Teddy")


@pytest.fixture(scope="session")
def cones():
    return load_dataset("Cones")


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
