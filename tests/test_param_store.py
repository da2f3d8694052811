"""ParamStore persistence and lifecycle (mirrors the reference's
``tests/test_param_store.py``: save/load roundtrip with constraints,
replacement, deletion, scoping, module-name helpers)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.params.param_store import (
    module_from_param_with_module_name,
    param_with_module_name,
    user_param_name,
)


@pytest.fixture(autouse=True)
def _clear():
    pyro.clear_param_store()
    yield
    pyro.clear_param_store()


def _populate(store):
    pyro.param("loc", jnp.asarray([0.5, -1.0]))
    pyro.param(
        "scale",
        jnp.asarray([1.5, 2.0]),
        constraint=dist.constraints.positive,
    )
    pyro.param(
        "probs",
        jnp.asarray([0.2, 0.3, 0.5]),
        constraint=dist.constraints.simplex,
    )


def test_save_load_roundtrip(tmp_path):
    store = pyro.get_param_store()
    _populate(store)
    before = {k: np.asarray(v) for k, v in store.items()}
    path = os.path.join(tmp_path, "params.pkl")
    store.save(path)

    pyro.clear_param_store()
    assert len(store) == 0
    store.load(path)
    assert set(store.keys()) == set(before)
    for k, v in before.items():
        assert np.allclose(np.asarray(store[k]), v, atol=1e-6), k
    # constraints survive: positive param is still constrained on update
    store["scale"] = jnp.asarray([3.0, 4.0])
    unconstrained = store.get_all_unconstrained()["scale"]
    assert np.allclose(np.exp(np.asarray(unconstrained)), [3.0, 4.0], atol=1e-5)


def test_constrained_view_consistency():
    store = pyro.get_param_store()
    _populate(store)
    probs = np.asarray(store["probs"])
    assert np.allclose(probs.sum(), 1.0, atol=1e-6)
    assert (probs > 0).all()


def test_delete_and_contains():
    store = pyro.get_param_store()
    _populate(store)
    assert "loc" in store
    del store["loc"]
    assert "loc" not in store
    assert set(store.keys()) == {"scale", "probs"}


def test_setdefault_idempotent():
    store = pyro.get_param_store()
    first = store.setdefault("x", jnp.asarray(1.0))
    second = store.setdefault("x", jnp.asarray(99.0))
    assert float(first) == float(second) == 1.0


def test_scope_isolates_state():
    store = pyro.get_param_store()
    pyro.param("outer", jnp.asarray(1.0))
    with store.scope() as fresh_state:
        assert "outer" not in store
        pyro.param("inner", jnp.asarray(2.0))
        assert "inner" in store
    assert "outer" in store and "inner" not in store
    # re-entering a captured scope restores its params
    with store.scope(state=None):
        pass


def test_scope_state_roundtrip():
    store = pyro.get_param_store()
    with store.scope() as state_a:
        pyro.param("a", jnp.asarray(1.0))
        state_a = store.get_state()
    with store.scope(state=state_a):
        assert "a" in store
        assert float(store["a"]) == 1.0


def test_param_name_lookup():
    store = pyro.get_param_store()
    p = pyro.param("named", jnp.asarray([1.0]))
    assert store.param_name(p) == "named"


def test_module_name_helpers():
    full = param_with_module_name("mod", "w")
    assert module_from_param_with_module_name(full) == "mod"
    assert user_param_name(full) == "w"
    assert user_param_name("plain") == "plain"


def test_svi_state_resume(tmp_path):
    """Optimize, checkpoint, clear, resume: losses continue decreasing
    from the checkpointed state (checkpoint/resume aux subsystem)."""
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    data = jnp.asarray([0.8, 1.2, 1.0])

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("N", data.shape[0]):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        loc = pyro.param("g_loc", 0.0)
        pyro.sample("loc", dist.Delta(loc))

    svi = SVI(model, guide, Adam({"lr": 0.1}), Trace_ELBO())
    for _ in range(50):
        svi.step(data)
    store = pyro.get_param_store()
    mid = float(store["g_loc"])
    path = os.path.join(tmp_path, "ckpt.pkl")
    store.save(path)

    pyro.clear_param_store()
    store.load(path)
    assert float(store["g_loc"]) == mid
    svi2 = SVI(model, guide, Adam({"lr": 0.1}), Trace_ELBO())
    for _ in range(200):
        svi2.step(data)
    assert abs(float(store["g_loc"]) - 1.0) < 0.1
