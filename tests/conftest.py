"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU platform so sharding/mesh tests run
without TPU hardware (SURVEY.md §7; multi-chip is validated this way and via
__graft_entry__.dryrun_multichip). Must run before jax is imported anywhere.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# NOTE: the JAX_PLATFORMS env var is overridden by the axon TPU plugin in this
# image; jax.config is the reliable switch (verified: env var leaves jax on
# "TPU v5 lite", config.update selects the 8-device virtual CPU platform).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
