"""Test environment: force the CPU backend with 8 virtual devices so
multi-chip sharding tests run without TPU hardware (SURVEY.md §4).

NB: this image's axon TPU plugin registers itself via sitecustomize and
programmatically overrides JAX_PLATFORMS, so env vars alone are not enough —
we must also set jax.config before any backend use.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # never grab the (single) TPU from tests
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("TF_ENABLE_ONEDNN_OPTS", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0)
