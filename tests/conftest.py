"""Test harness config: force a virtual 8-device CPU mesh.

Note: this container's sitecustomize imports JAX at interpreter start and the
environment exports JAX_PLATFORMS=axon (a real-TPU tunnel), so plain env-var
overrides are too late/ignored. We must set XLA_FLAGS before backend init and
switch the platform via jax.config after import.
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
# f64 available for oracle/finite-difference tests (device code is
# explicitly dtype-annotated, so f32 paths are unaffected).
jax.config.update("jax_enable_x64", True)

import numpy as np
import pytest


@pytest.fixture
def rng_np():
    return np.random.default_rng(1234)
