"""Backend-generic conformance tests.

Mirrors the reference's pyroapi conformance run
(``/root/reference/tests/pyroapi/test_pyroapi.py``): the same generic
model code must behave identically through the full ``pyro_tpu`` backend
and the didactic ``contrib.minipyro`` backend.  The external ``pyroapi``
package is unavailable in this environment, so the generic test bodies
(modeled on ``pyroapi.tests``) live here.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu
import pyro_tpu.distributions as dist
from pyro_tpu.contrib import minipyro


class PyroBackend:
    name = "pyro"
    sample = staticmethod(pyro_tpu.sample)
    param = staticmethod(pyro_tpu.param)
    plate = staticmethod(pyro_tpu.plate)

    @staticmethod
    def get_param_store():
        return pyro_tpu.get_param_store()

    @staticmethod
    def clear_param_store():
        pyro_tpu.clear_param_store()

    @staticmethod
    def seed_handler(fn, key):
        from pyro_tpu import poutine

        return poutine.seed(fn, rng_key=key)

    @staticmethod
    def svi(model, guide, lr):
        from pyro_tpu.infer import SVI, Trace_ELBO
        from pyro_tpu.optim import Adam

        return SVI(model, guide, Adam({"lr": lr}), Trace_ELBO())


class MinipyroBackend:
    name = "minipyro"
    sample = staticmethod(minipyro.sample)
    param = staticmethod(minipyro.param)
    plate = staticmethod(minipyro.plate)

    @staticmethod
    def get_param_store():
        return minipyro.get_param_store()

    @staticmethod
    def clear_param_store():
        minipyro.clear_param_store()

    @staticmethod
    def seed_handler(fn, key):
        return minipyro.seed(fn, key)

    @staticmethod
    def svi(model, guide, lr):
        return minipyro.SVI(
            model, guide, minipyro.Adam({"lr": lr}), minipyro.Trace_ELBO()
        )


@pytest.fixture(params=[PyroBackend, MinipyroBackend], ids=lambda b: b.name)
def backend(request):
    request.param.clear_param_store()
    yield request.param
    request.param.clear_param_store()


def test_model_sample(backend):
    def model():
        return backend.sample("x", dist.Normal(0.0, 1.0))

    x = backend.seed_handler(model, jax.random.key(0))()
    assert jnp.ndim(x) == 0 and np.isfinite(float(x))


def test_model_param(backend):
    def model():
        return backend.param("p", jnp.ones(3))

    p = backend.seed_handler(model, jax.random.key(0))()
    assert p.shape == (3,)
    # persists in the store
    assert "p" in backend.get_param_store()


def test_plate_broadcast(backend):
    def model():
        with backend.plate("data", 5, dim=-1):
            return backend.sample(
                "x", dist.Normal(jnp.zeros(5), 1.0)
            )

    x = backend.seed_handler(model, jax.random.key(0))()
    assert x.shape == (5,)


def test_svi_smoke(backend):
    data = jax.random.normal(jax.random.key(1), (50,)) + 2.0

    def model(data):
        loc = backend.sample("loc", dist.Normal(0.0, 1.0))
        with backend.plate("data", len(data), dim=-1):
            backend.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        q_loc = backend.param("q_loc", jnp.zeros(()))
        q_scale = jnp.exp(backend.param("q_scale_log", jnp.zeros(())))
        backend.sample("loc", dist.Normal(q_loc, q_scale))

    svi = backend.svi(model, guide, lr=0.05)
    losses = [svi.step(data) for _ in range(120)]
    assert losses[-1] < losses[0]
    # conjugate posterior mean = sum(data) / (n + 1)
    expected = float(data.sum() / (len(data) + 1))
    actual = float(np.asarray(jax.device_get(
        dict(backend.get_param_store())["q_loc"]
        if backend.name == "minipyro"
        else pyro_tpu.param("q_loc")
    )))
    assert abs(actual - expected) < 0.25, (actual, expected)


def test_rng_seed_reproducibility(backend):
    def model():
        return backend.sample("x", dist.Normal(0.0, 1.0))

    x1 = backend.seed_handler(model, jax.random.key(7))()
    x2 = backend.seed_handler(model, jax.random.key(7))()
    x3 = backend.seed_handler(model, jax.random.key(8))()
    assert float(x1) == float(x2)
    assert float(x1) != float(x3)


def test_obs_passthrough(backend):
    def model():
        return backend.sample(
            "x", dist.Normal(0.0, 1.0), obs=jnp.asarray(1.5)
        )

    x = backend.seed_handler(model, jax.random.key(0))()
    assert float(x) == 1.5
