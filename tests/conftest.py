"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the TPU-native analog of "test multi-node without a cluster" — all
sharding/pjit tests exercise real collectives over 8 XLA host devices
(SURVEY.md §4 implication). Must run before jax is imported anywhere.
"""
import os

os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# The axon sitecustomize registers a remote-TPU backend at interpreter start
# and overrides jax_platforms; without this, every test compile ships over
# the single TPU tunnel (serialized, ~100x slower). Force local CPU.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
