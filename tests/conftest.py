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

# float64 test axis (ref tests/conftest.py:12-14 PYRO_DTYPE switching):
# PYRO_TPU_X64=1 runs the suite in double precision, where the
# quadrature-heavy paths' documented accuracy claims live.  Tests can
# read the active dtype from the `x64_enabled` flag below.
X64 = os.environ.get("PYRO_TPU_X64") == "1"
if X64:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: most of the unit tier's wall time is XLA
# compilation, so warm-cache runs are several times faster (ref runs its
# unit tier on many cores; this host has one).
_CACHE_DIR = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _CACHE_DIR)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import signal

import pytest

import pyro_tpu


@pytest.fixture(autouse=True)
def _clean_global_state():
    pyro_tpu.clear_param_store()
    pyro_tpu.set_rng_seed(0)
    yield
    pyro_tpu.clear_param_store()


# -- per-test timeout (no pytest-timeout in this image) ----------------------
#
# A single hung compile must not stall the whole tier; SIGALRM is safe here
# because pytest executes tests in the main thread.  Override per test with
# ``@pytest.mark.timeout(seconds)``.

DEFAULT_TEST_TIMEOUT = int(os.environ.get("PYRO_TPU_TEST_TIMEOUT", "300"))


@pytest.hookimpl(hookwrapper=True)
def pytest_runtest_call(item):
    marker = item.get_closest_marker("timeout")
    seconds = int(marker.args[0]) if marker and marker.args else DEFAULT_TEST_TIMEOUT
    if seconds <= 0 or not hasattr(signal, "SIGALRM"):
        yield
        return

    def _on_alarm(signum, frame):
        raise TimeoutError(
            f"test exceeded per-test timeout of {seconds}s (conftest SIGALRM)"
        )

    old = signal.signal(signal.SIGALRM, _on_alarm)
    signal.alarm(seconds)
    try:
        yield
    finally:
        signal.alarm(0)
        signal.signal(signal.SIGALRM, old)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "timeout(seconds): per-test wall-clock budget"
    )


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


# the smoke tier: a curated fast slice (< 5 min single-core, measured)
# spanning the runtime stack — effect handlers, primitives/params, all
# four ELBO estimator families' gradients, one enumeration suite, one
# MCMC case, model validation.  `pytest --stage smoke`.
SMOKE_MODULES = {
    "test_poutines",
    "test_handlers",
    "test_svi",
    "test_param_store",
    "test_elbo_gradients",
    "test_enum",
    "test_valid_models",
    "test_pyro_module",
    "test_doc_claims",
    "test_neural_markov",
    "test_funsor",
}
# within smoke modules, heavyweight statistical cases are excluded by
# keyword so the tier stays under its budget
SMOKE_EXCLUDE_KEYWORDS = ()


def pytest_collection_modifyitems(config, items):
    stages = set(config.getoption("--stage"))
    if not stages or "all" in stages:
        return
    selected, deselected = [], []
    for item in items:
        marker = item.get_closest_marker("stage")
        item_stages = set(marker.args) if marker else {"unit"}
        if "smoke" in stages:
            mod = item.module.__name__.rsplit(".", 1)[-1]
            if mod in SMOKE_MODULES and "integration" not in item_stages:
                item_stages = item_stages | {"smoke"}
        if item_stages & stages:
            selected.append(item)
        else:
            deselected.append(item)
    if deselected:
        config.hook.pytest_deselected(items=deselected)
        items[:] = selected
