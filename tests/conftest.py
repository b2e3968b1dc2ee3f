"""Test config: run on CPU with 8 virtual devices.

Mirrors the reference's variant-fixture strategy (src/conftest.py:29-137):
the CPU backend acts as the oracle, and the 8-device virtual mesh exercises
the multi-chip sharding path without TPU hardware. The environment may pin
JAX_PLATFORMS to a hardware plugin (axon), so the override goes through
jax.config, which wins over the env var.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


@pytest.fixture
def np_rng():
    return np.random.default_rng(seed=12345)
