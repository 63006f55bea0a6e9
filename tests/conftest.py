"""Test harness: run everything on CPU with 8 virtual XLA devices so the
pjit/mesh paths are exercised without TPU hardware (SURVEY.md section 4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("USE_TF", "0")  # keep transformers from probing TF
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

# The axon TPU plugin in this image overrides JAX_PLATFORMS at registration;
# pin the config explicitly so tests always run on host CPU devices.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.RandomState(0)
