"""Test harness config: run all tests on a virtual 8-device CPU mesh.

This is the standard JAX trick for exercising multi-device sharding without a
cluster (SURVEY.md §4). The environment boots an `axon` TPU platform via
sitecustomize (which imports jax and pins jax_platforms='axon,cpu'), so the
override must go through jax.config after import, plus XLA_FLAGS before the
CPU backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng_np():
    return np.random.default_rng(0)
