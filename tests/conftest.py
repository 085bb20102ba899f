"""Test configuration: hermetic 8-virtual-device CPU JAX.

Mirrors the SURVEY.md §4 plan: multi-device paths are tested without TPU
hardware via XLA's host-platform device-count override.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# sitecustomize pre-imports jax config with JAX_PLATFORMS=axon; override it.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)
