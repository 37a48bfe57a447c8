"""Test config: force the CPU platform with 8 virtual devices so sharding /
multi-chip paths are testable without a TPU pod (SURVEY.md §4).

Note: this image preimports jax and registers the 'axon' TPU PJRT plugin at
interpreter startup (sitecustomize), and plugin registration overrides the
JAX_PLATFORMS env var — so we must force the platform through jax.config
before any backend is initialized.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
