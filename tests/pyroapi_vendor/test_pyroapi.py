"""Backend-generic conformance suite (vendored pyroapi.tests).

The external ``pyro-api`` package is not available in this environment,
so the generic test bodies are reconstructed here in its style: every
test is written purely against the generic module handles
(``pyro``, ``distributions``, ``handlers``, ``infer``, ``optim``) from
``pyro_tpu.contrib.pyroapi`` and must pass — or xfail via
``NotImplementedError`` — under EVERY registered backend, exactly as
``/root/reference/tests/pyroapi/test_pyroapi.py`` runs the suite over
the ``pyro`` and ``minipyro`` backends.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu
from pyro_tpu.contrib.pyroapi import (
    distributions as dist,
    handlers,
    infer,
    optim,
    pyro,
    pyro_backend,
)

pytestmark = pytest.mark.stage("unit")


@pytest.fixture(params=["pyro", "minipyro"])
def backend(request):
    pyro_tpu.clear_param_store()
    with pyro_backend(request.param):
        yield request.param
    pyro_tpu.clear_param_store()


def test_generate_data(backend):
    def model():
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        return pyro.sample("obs", dist.Normal(loc, 1.0))

    x = handlers.seed(model, rng_seed=0)()
    assert jnp.ndim(x) == 0 and np.isfinite(float(x))


def test_generate_data_plate(backend):
    num_points = 10

    def model():
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        with pyro.plate("data", num_points, dim=-1):
            return pyro.sample("obs", dist.Normal(loc, 1.0))

    x = handlers.seed(model, rng_seed=0)()
    assert x.shape == (num_points,)


def test_rng_seed(backend):
    def model():
        return pyro.sample("x", dist.Normal(0.0, 1.0))

    x1 = handlers.seed(model, rng_seed=5)()
    x2 = handlers.seed(model, rng_seed=5)()
    x3 = handlers.seed(model, rng_seed=6)()
    assert float(x1) == float(x2)
    assert float(x1) != float(x3)


def test_trace_handler(backend):
    def model():
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=jnp.asarray(0.3))
        return loc

    tr = handlers.trace(handlers.seed(model, rng_seed=0)).get_trace()
    nodes = tr.nodes if hasattr(tr, "nodes") else tr
    assert "loc" in nodes and "obs" in nodes
    assert float(nodes["obs"]["value"]) == pytest.approx(0.3)


def test_replay_handler(backend):
    def model():
        return pyro.sample("x", dist.Normal(0.0, 1.0))

    seeded = handlers.seed(model, rng_seed=0)
    tr = handlers.trace(seeded).get_trace()
    replayed = handlers.replay(handlers.seed(model, rng_seed=99), tr)
    x = replayed()
    nodes = tr.nodes if hasattr(tr, "nodes") else tr
    assert float(x) == float(nodes["x"]["value"])


def test_condition_handler(backend):
    def model():
        return pyro.sample("x", dist.Normal(0.0, 1.0))

    conditioned = handlers.condition(model, data={"x": jnp.asarray(2.5)})
    x = handlers.seed(conditioned, rng_seed=0)()
    assert float(x) == 2.5


def test_param_store(backend):
    def model():
        return pyro.param("theta", jnp.zeros(2))

    theta = handlers.seed(model, rng_seed=0)()
    assert theta.shape == (2,)
    assert "theta" in pyro.get_param_store()
    pyro.clear_param_store()
    assert "theta" not in pyro.get_param_store()


@pytest.mark.parametrize("jit", [False, True], ids=["nojit", "jit"])
def test_optimizer(backend, jit):
    data = jax.random.normal(jax.random.key(1), (40,)) + 1.5

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        with pyro.plate("data", len(data), dim=-1):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        q_loc = pyro.param("q_loc", jnp.zeros(()))
        q_scale = jnp.exp(pyro.param("q_scale_log", jnp.zeros(())))
        pyro.sample("loc", dist.Normal(q_loc, q_scale))

    if jit and backend == "minipyro":
        raise NotImplementedError("minipyro SVI.step is already jitted")
    Elbo = infer.JitTrace_ELBO if jit else infer.Trace_ELBO
    svi = infer.SVI(model, guide, optim.Adam({"lr": 0.05}), Elbo())
    losses = [float(svi.step(data)) for _ in range(200)]
    # single-sample ELBO is stochastic: compare window means and check
    # the variational mean found the conjugate posterior mean
    assert np.mean(losses[-20:]) < np.mean(losses[:20])
    expected = float(data.sum() / (len(data) + 1))
    q_loc = float(np.asarray(jax.device_get(pyro.param("q_loc"))))
    assert abs(q_loc - expected) < 0.3, (q_loc, expected)


def test_mcmc_interface(backend):
    def model():
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(loc, 0.5), obs=jnp.asarray(1.0))

    kernel = infer.NUTS(model)
    mcmc = infer.MCMC(kernel, num_samples=60, warmup_steps=60)
    mcmc.run(rng_key=jax.random.key(0))
    samples = mcmc.get_samples()
    assert "loc" in samples
    # posterior mean of loc given obs=1, prior N(0,1), lik N(loc,0.5):
    # precision-weighted: (0*1 + 1*4)/(1+4) = 0.8
    assert abs(float(np.mean(np.asarray(samples["loc"]))) - 0.8) < 0.25


def test_local_backend_map(backend):
    """An explicit module map works without registration."""
    with pyro_backend(
        {
            "pyro": "pyro_tpu",
            "distributions": "pyro_tpu.distributions",
            "handlers": "pyro_tpu.poutine",
        }
    ):
        x = handlers.seed(
            lambda: pyro.sample("x", dist.Normal(0.0, 1.0)), rng_seed=0
        )()
        assert np.isfinite(float(x))
