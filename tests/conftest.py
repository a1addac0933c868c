"""Test configuration: run everything on a virtual 8-device CPU platform.

This is the JAX-standard trick for testing real multi-device sharding code
without a TPU pod (SURVEY.md §4.4): the same shard_map/psum code paths run on
8 host devices; correctness there implies the collectives are wired right.
Must run before jax is imported anywhere.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

# The axon TPU plugin overrides the JAX_PLATFORMS env var; the config update
# wins, so tests run on the virtual 8-device CPU platform, not the tunnel.
# SPT_TEST_TPU=1 escapes the pin for the TPU-gated kernel tests.
if not os.environ.get("SPT_TEST_TPU"):
    jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng_np():
    return np.random.default_rng(1234)
