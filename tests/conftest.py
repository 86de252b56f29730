"""Test harness configuration.

Forces JAX onto a virtual 8-device CPU platform *before* jax is imported —
the standard TPU-ecosystem answer to testing multi-chip sharding without a
pod (SURVEY.md §4).  The axon TPU plugin registered by the container's
sitecustomize is disabled for tests by clearing its trigger env var.
"""

import os

os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"
# parity tests pin the exact cv2 preprocessing path; the native C++ path has
# its own tolerance test (tests/test_native_preproc.py)
os.environ["VDA_NATIVE_PREPROC"] = "0"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

# The container's sitecustomize imports jax at interpreter startup (axon TPU
# plugin registration), so env vars alone are too late — override the live
# config as well.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    return np.random.RandomState(0)
