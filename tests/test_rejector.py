"""Rejector correctness (ports the core of the reference's
``tests/distributions/test_rejector.py``): a rejection-sampled
Exponential (propose from Exponential(factor*rate), accept with the
ratio) must match the target Exponential in moments and log_prob.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.distributions import Rejector


def rejection_exponential(rate, factor):
    """Target Exponential(rate) via proposal Exponential(factor*rate)
    with acceptance exp(-(1-factor) rate x) / normalizer (factor<=1)."""
    propose = dist.Exponential(factor * rate)

    def log_prob_accept(x):
        return (factor - 1.0) * rate * x

    log_scale = jnp.log(jnp.asarray(factor))
    return Rejector(propose, log_prob_accept, log_scale)


@pytest.mark.parametrize("rate", [0.5, 1.0, 2.0])
@pytest.mark.parametrize("factor", [0.25, 0.5, 1.0])
def test_rejection_exponential_moments(rate, factor):
    n = 200000
    d1 = dist.Exponential(jnp.full((1,), rate))
    d2 = rejection_exponential(jnp.full((1,), rate), factor)
    x1 = d1.rsample(jax.random.key(0), (n,))
    x2 = d2.rsample(jax.random.key(1), (n,))
    np.testing.assert_allclose(
        float(x2.mean()), float(x1.mean()), atol=0.03
    )
    np.testing.assert_allclose(
        float(x2.std()), float(x1.std()), atol=0.03
    )
    np.testing.assert_allclose(
        np.asarray(d2.log_prob(x1[:100])),
        np.asarray(d1.log_prob(x1[:100])),
        rtol=1e-5,
    )


def test_rejector_shapes():
    d = rejection_exponential(jnp.ones((3,)), 0.5)
    x = d.rsample(jax.random.key(2), (7,))
    assert x.shape == (7, 3)
    assert d.log_prob(x).shape == (7, 3)
