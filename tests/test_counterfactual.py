"""Counterfactual (SWIG) semantics of ``poutine.do`` composed with
``poutine.condition`` (mirrors ``tests/poutine/test_counterfactual.py``):
the trace keeps the original site as a free/observed sample, the
intervention is recorded under ``name__CF``, and the intervened value is
what propagates into the model's return flow.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine


@pytest.mark.parametrize(
    "intervene,observe,flip",
    [
        (True, False, False),
        (False, True, False),
        (True, True, False),
        (True, True, True),
    ],
    ids=["do", "condition", "do+condition", "condition+do"],
)
def test_counterfactual_query(intervene, observe, flip):
    # x -> y -> z -> w
    sites = ["x", "y", "z", "w"]
    observations = {"x": 1.0, "y": None, "z": 1.0, "w": 1.0}
    interventions = {"x": None, "y": 0.0, "z": 2.0, "w": 1.0}

    def model():
        x = pyro.sample("x", dist.Normal(0.0, 1.0))
        y = pyro.sample("y", dist.Normal(x, 1.0))
        z = pyro.sample("z", dist.Normal(y, 1.0))
        w = pyro.sample("w", dist.Normal(z, 1.0))
        return dict(x=x, y=y, z=z, w=w)

    obs_data = {
        k: jnp.asarray(v) for k, v in observations.items() if v is not None
    }
    int_data = {
        k: jnp.asarray(v) for k, v in interventions.items() if v is not None
    }
    fn = model
    if not flip:
        if intervene:
            fn = poutine.do(fn, data=int_data)
        if observe:
            fn = poutine.condition(fn, data=obs_data)
    elif flip and intervene and observe:
        fn = poutine.do(poutine.condition(fn, data=obs_data), data=int_data)

    tr = poutine.trace(poutine.seed(fn, rng_key=jax.random.key(0))).get_trace()
    actual_values = tr.nodes["_RETURN"]["value"]
    for name in sites:
        if not intervene and observe:
            # case 1: purely observational, like poutine.condition
            if observations[name] is not None:
                assert tr.nodes[name]["is_observed"]
                assert float(actual_values[name]) == observations[name]
                assert float(tr.nodes[name]["value"]) == observations[name]
            if interventions[name] != observations[name]:
                assert float(actual_values[name]) != interventions[name]
        elif intervene and not observe:
            # case 2: purely interventional
            assert not tr.nodes[name]["is_observed"]
            if interventions[name] is not None:
                assert float(actual_values[name]) == interventions[name]
            assert float(tr.nodes[name]["value"]) != observations[name]
            assert float(tr.nodes[name]["value"]) != interventions[name]
        elif intervene and observe:
            # case 3: counterfactual query
            if observations[name] is not None:
                assert tr.nodes[name]["is_observed"]
                assert float(tr.nodes[name]["value"]) == observations[name]
            if interventions[name] is not None:
                assert float(actual_values[name]) == interventions[name]
            if interventions[name] != observations[name]:
                assert float(tr.nodes[name]["value"]) != interventions[name]


def test_do_propagates_downstream():
    """Intervened value feeds downstream sites; the original site remains
    a free sample."""

    def model():
        x = pyro.sample("x", dist.Normal(0.0, 1.0))
        y = pyro.sample("y", dist.Normal(x, 0.001))
        return y

    intervened = poutine.do(model, data={"x": jnp.asarray(5.0)})
    tr = poutine.trace(
        poutine.seed(intervened, rng_key=jax.random.key(0))
    ).get_trace()
    assert np.allclose(float(tr.nodes["y"]["fn"].loc), 5.0)
    assert "x" in tr.nodes and not tr.nodes["x"]["is_observed"]
    assert float(tr.nodes["x"]["value"]) != 5.0
    # the mangled __CF message stops below the outer trace (stop=True),
    # exactly as in the reference
    assert "x__CF" not in tr.nodes


def test_do_in_svi_smoke():
    """do + condition composes with autoguides and SVI
    (ref test_counterfactual.py:82)."""
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.infer.autoguide import AutoMultivariateNormal
    from pyro_tpu.optim import Adam

    pyro.clear_param_store()

    def model(N):
        with pyro.plate("x_plate", N):
            z1 = pyro.sample(
                "z1",
                dist.MultivariateNormal(jnp.zeros(2), jnp.eye(2)),
            )
            z2 = pyro.sample(
                "z2",
                dist.MultivariateNormal(jnp.zeros(2), jnp.eye(2)),
            )
            return pyro.sample(
                "x", dist.MultivariateNormal(z1 + z2, jnp.eye(2))
            )

    fix_z1 = jnp.asarray([[-6.1, -6.2], [-4.2, -4.3]])
    obs_x = jnp.asarray([[-6.1, -6.2], [-4.2, -4.3]])
    do_model = poutine.do(model, data={"z1": fix_z1})
    do_model = poutine.condition(do_model, data={"x": obs_x})
    guide = AutoMultivariateNormal(do_model)
    svi = SVI(do_model, guide, Adam({"lr": 0.05}), Trace_ELBO())
    loss = svi.step(len(obs_x))
    assert np.isfinite(loss)
