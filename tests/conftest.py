"""Test harness config: force a TRUE CPU backend with 8 virtual devices so
the multi-chip sharding paths compile and execute without TPU hardware
(SURVEY.md §4 test strategy).

Environment subtlety: this image's sitecustomize boots the axon TPU plugin
and pins JAX_PLATFORMS=axon before pytest ever runs, so env vars set here are
too late — but backends initialise lazily, so overriding the jax config
before first device use works.  Without this, "CPU" tests silently run on
the single TPU through a high-latency compile relay.
"""
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "-1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import pathlib

import numpy as np
import pytest

GOLDEN_DIR = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    def load(name):
        return dict(np.load(GOLDEN_DIR / name))
    return load
