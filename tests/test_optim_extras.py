"""Optimizer extras + AutoLaplace tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import AutoLaplaceApproximation
from pyro_tpu.optim import (
    Adam,
    DCTAdam,
    ExponentialLR,
    MixedMultiOptimizer,
    Newton,
    PyroMultiOptimizer,
    StepLR,
)

DATA = jnp.array([1.0, 2.0, 3.0])
POST_VAR = 1.0 / (1.0 / 100.0 + 3.0)
POST_LOC = POST_VAR * 6.0


def model(data):
    loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
    with pyro.plate("data", data.shape[0]):
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)


def guide(data):
    m = pyro.param("m", 0.0)
    s = pyro.param("s", 1.0, constraint=dist.constraints.positive)
    pyro.sample("loc", dist.Normal(m, s))


@pytest.mark.parametrize("optim_factory", [
    lambda: ExponentialLR({"lr": 0.1, "gamma": 0.999}),
    lambda: StepLR({"lr": 0.1, "step_size": 200, "gamma": 0.5}),
])
def test_schedulers_train(optim_factory):
    svi = SVI(model, guide, optim_factory(), Trace_ELBO(num_particles=8))
    for _ in range(1500):
        svi.step(DATA)
    assert abs(float(pyro.get_param_store()["m"]) - POST_LOC) < 0.3


def test_dct_adam_trains_timeseries_params():
    T = 16
    data = jnp.sin(jnp.linspace(0, 3, T)) + 0.05 * jax.random.normal(
        jax.random.key(0), (T,)
    )

    def ts_model(data):
        drift = pyro.param("drift", jnp.zeros(T))
        with pyro.plate("t", T):
            pyro.sample("obs", dist.Normal(drift, 0.1), obs=data)

    def ts_guide(data):
        pass

    svi = SVI(ts_model, ts_guide, DCTAdam({"lr": 0.05}), Trace_ELBO())
    for _ in range(800):
        svi.step(data)
    drift = np.asarray(pyro.get_param_store()["drift"])
    assert np.abs(drift - np.asarray(data)).mean() < 0.1


def test_newton_multioptimizer():
    data = jnp.array([1.0, 2.0, 3.0])

    def loss_fn(params):
        x = params["x"]
        return jnp.sum((x - data) ** 2)

    newton = Newton()
    params = {"x": jnp.zeros(3)[None, :]}
    new = newton.step(lambda p: loss_fn({"x": p["x"][0]}) if False else loss_fn({"x": p["x"].reshape(-1)}), params)
    assert np.allclose(np.asarray(new["x"]).reshape(-1), np.asarray(data), atol=1e-4)


def test_mixed_multioptimizer():
    def loss_fn(params):
        return jnp.sum((params["a"] - 2.0) ** 2) + jnp.sum(
            (params["b"] - 3.0) ** 2
        )

    opt = MixedMultiOptimizer(
        [
            (["a"], PyroMultiOptimizer(Adam({"lr": 0.1}))),
            (["b"], Newton()),
        ]
    )
    params = {"a": jnp.zeros(()), "b": jnp.zeros((1, 1))}
    for _ in range(200):
        params = opt.step(
            lambda p: loss_fn(
                {"a": p["a"], "b": p["b"].reshape(-1)}
            ),
            params,
        )
    assert abs(float(params["a"]) - 2.0) < 0.1
    assert abs(float(params["b"].reshape(())) - 3.0) < 1e-3


def test_auto_laplace_approximation():
    guide_map = AutoLaplaceApproximation(model)
    svi = SVI(model, guide_map, Adam({"lr": 0.05}), Trace_ELBO())
    for _ in range(1500):
        svi.step(DATA)
    laplace = guide_map.laplace_approximation(DATA)
    med = laplace.median()
    assert np.allclose(np.asarray(med["loc"]), POST_LOC, atol=0.1)
    # Laplace scale should match the exact posterior sd for this
    # conjugate-Gaussian model
    from pyro_tpu.params.param_store import get_param_store

    st = get_param_store()[f"{laplace._name}.scale_tril"]
    assert np.allclose(float(st[0, 0]), POST_VAR**0.5, rtol=0.05)
