"""Test configuration.

Tests run on CPU with 8 virtual devices (so multi-chip sharding paths are
exercised without TPU hardware, per SURVEY.md §4) and with x64 enabled so
float64 scipy oracles can be matched tightly.  TPU execution paths are
identical code — only the platform differs.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The axon sitecustomize force-registers the TPU backend and rewrites
# jax_platforms to "axon,cpu"; override it *after* import so tests run on
# the 8 virtual CPU devices (f64-capable, no remote-compile round-trips).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(42)
