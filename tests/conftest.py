"""Test configuration: force JAX onto 8 virtual CPU devices.

Must run before the first ``import jax`` anywhere in the test session so that
sharding/pjit tests can exercise a real multi-device mesh without TPU pods
(the standard ``xla_force_host_platform_device_count`` trick, SURVEY.md §4).
"""

import os

# Force-override: the ambient environment may pin JAX_PLATFORMS to a TPU
# backend; unit tests always run on the virtual 8-device CPU mesh.  Set
# RL6_TEST_TPU=1 to keep the ambient (TPU) platform instead -- used for the
# device-only tests (e.g. the compiled Pallas kernel).
USE_TPU = os.environ.get("RL6_TEST_TPU") == "1"

if not USE_TPU:
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

# The container's sitecustomize may have imported jax already (registering a
# TPU-tunnel platform), in which case the env var above came too late; update
# the live config before any backend is initialized.
import jax

if not USE_TPU:
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.RandomState(20260817)
