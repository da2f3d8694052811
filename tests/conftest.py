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


# -- stage markers (ref ``tests/conftest.py:40-115``) -----------------------
#
# Tests default to stage "unit"; slow statistical / training-loop suites
# mark themselves ``pytestmark = pytest.mark.stage("integration")``.
# Select with ``--stage unit`` (fast tier), ``--stage integration``, or no
# flag for everything.


def pytest_addoption(parser):
    parser.addoption(
        "--stage",
        action="append",
        metavar="NAME",
        default=[],
        help="only run tests matching this stage; can repeat",
    )


def pytest_collection_modifyitems(config, items):
    stages = set(config.getoption("--stage"))
    if not stages or "all" in stages:
        return
    selected, deselected = [], []
    for item in items:
        marker = item.get_closest_marker("stage")
        item_stages = set(marker.args) if marker else {"unit"}
        if item_stages & stages:
            selected.append(item)
        else:
            deselected.append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected
