"""Test harness config: force CPU with a virtual 8-device mesh so the
multi-chip sharding paths compile and execute without TPU hardware
(SURVEY.md §4 test strategy)."""
import os

# Must be set before jax is imported anywhere.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    def load(name):
        return dict(np.load(GOLDEN_DIR / name))
    return load
