"""Test configuration.

Mirrors the reference's global fixtures (``tests/conftest.py:29-38``):
cleared param store + validation per test.  Tests run on a virtual
8-device CPU mesh (the axon TPU plugin ignores ``JAX_PLATFORMS``, so we
force CPU through jax.config before any backend is initialized).
"""

import os

os.environ.setdefault("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORM_NAME"] = "cpu"

import jax

jax.config.update("jax_platforms", "cpu")

import pytest

import pyro_tpu


@pytest.fixture(autouse=True)
def _clean_global_state():
    pyro_tpu.clear_param_store()
    pyro_tpu.set_rng_seed(0)
    yield
    pyro_tpu.clear_param_store()
