"""Autoguides against EXACT conjugate posteriors (ports the reference's
``tests/infer/test_autoguide.py::test_exact`` / ``test_exact_batch``):
after SVI on a linear-Gaussian model, every continuous autoguide family
must recover the closed-form posterior mean/std AND the exact -log
evidence as its converged ELBO.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import (
    AutoDiagonalNormal,
    AutoGaussian,
    AutoHierarchicalNormalMessenger,
    AutoLowRankMultivariateNormal,
    AutoMultivariateNormal,
    AutoNormal,
    AutoNormalMessenger,
    AutoRegressiveMessenger,
    AutoStructured,
)
from pyro_tpu.optim import ClippedAdam

pytestmark = pytest.mark.stage("integration")

GUIDES = [
    AutoNormal,
    AutoDiagonalNormal,
    AutoMultivariateNormal,
    AutoLowRankMultivariateNormal,
    AutoStructured,
    AutoGaussian,
    AutoNormalMessenger,
    AutoHierarchicalNormalMessenger,
    AutoRegressiveMessenger,
]
IDS = [g.__name__ for g in GUIDES]

DATA = jnp.asarray([0.2, -1.1, 0.7])


def _fit(Guide, model, data, num_steps=1000):
    pyro.clear_param_store()
    guide = Guide(model)
    elbo = Trace_ELBO(num_particles=100, vectorize_particles=True)
    optim = ClippedAdam(
        {"lr": 0.05, "lrd": 0.1 ** (1 / num_steps)}
    )
    svi = SVI(model, guide, optim, elbo)
    losses = svi.run_steps(num_steps, data, rng_key=jax.random.key(0))
    assert np.isfinite(np.asarray(losses)).all()
    return guide, elbo, svi


def _posterior_draws(guide, model, data, n=10000):
    from pyro_tpu.infer import Predictive

    pred = Predictive(
        model, guide=guide, num_samples=n, return_sites=["loc"]
    )
    return pred(data, rng_key=jax.random.key(7))["loc"]


@pytest.mark.parametrize("Guide", GUIDES, ids=IDS)
def test_exact(Guide):
    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        with pyro.plate("data", len(data)):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)
        return loc

    data = DATA
    n = len(data)
    expected_mean = float(data.sum()) / (1 + n)
    expected_std = (1 + n) ** (-0.5)
    # exact -log evidence of N(0,1) prior + unit-noise likelihood
    expected_loss = -float(
        dist.MultivariateNormal(
            jnp.zeros(n), jnp.eye(n) + jnp.ones((n, n))
        ).log_prob(data)
    )

    guide, elbo, svi = _fit(Guide, model, data)
    samples = _posterior_draws(guide, model, data)
    np.testing.assert_allclose(
        float(np.mean(np.asarray(samples))), expected_mean, atol=0.05
    )
    np.testing.assert_allclose(
        float(np.std(np.asarray(samples))), expected_std, rtol=0.1
    )
    actual_loss = float(
        elbo.loss(model, guide, data, rng_key=jax.random.key(9))
    )
    np.testing.assert_allclose(actual_loss, expected_loss, atol=0.05)


@pytest.mark.parametrize("Guide", GUIDES, ids=IDS)
def test_exact_batch(Guide):
    def model(data):
        with pyro.plate("data", len(data)):
            loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)
        return loc

    data = DATA
    expected_mean = np.asarray(data) / 2.0
    expected_std = np.full(len(data), 0.5**0.5)
    expected_loss = -float(
        jnp.sum(dist.Normal(0.0, jnp.sqrt(2.0)).log_prob(data))
    )

    guide, elbo, svi = _fit(Guide, model, data)
    samples = np.asarray(_posterior_draws(guide, model, data))
    np.testing.assert_allclose(samples.mean(0), expected_mean, atol=0.06)
    np.testing.assert_allclose(samples.std(0), expected_std, rtol=0.12)
    actual_loss = float(
        elbo.loss(model, guide, data, rng_key=jax.random.key(9))
    )
    np.testing.assert_allclose(actual_loss, expected_loss, atol=0.05)
