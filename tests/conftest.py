"""Test harness config: force the CPU backend with 8 virtual devices so
mesh/sharding logic is exercised without TPU hardware (SURVEY.md §4)."""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

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
