"""Binomial/BetaBinomial Gaussian-approximation paths (ports the
reference's ``tests/distributions/test_binomial.py``): moment agreement
between exact and approximate samplers under
``set_approx_sample_thresh``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.contrib.epidemiology.distributions import (
    set_approx_sample_thresh,
)


@pytest.mark.parametrize("total_count", [10, 100, 1000, 4000])
@pytest.mark.parametrize("prob", [0.01, 0.1, 0.5, 0.9, 0.99])
def test_binomial_approx_sample(total_count, prob):
    sample_shape = (10000,)
    d = dist.Binomial(total_count, prob)
    expected = d.sample(jax.random.key(0), sample_shape)
    with set_approx_sample_thresh(200):
        actual = dist.Binomial(total_count, prob).sample(
            jax.random.key(1), sample_shape
        )
    np.testing.assert_allclose(
        float(actual.mean()), float(expected.mean()), rtol=0.05, atol=0.2
    )
    np.testing.assert_allclose(
        float(actual.std()), float(expected.std()), rtol=0.05, atol=0.1
    )
    # approximate samples stay inside the support
    assert float(actual.min()) >= 0
    assert float(actual.max()) <= total_count


@pytest.mark.parametrize("total_count", [10, 100, 1000])
@pytest.mark.parametrize("c1,c0", [(0.5, 0.5), (1.0, 1.0), (10.0, 1.0)])
def test_beta_binomial_approx_sample(c1, c0, total_count):
    sample_shape = (10000,)
    d = dist.BetaBinomial(c1, c0, total_count)
    expected = d.sample(jax.random.key(2), sample_shape)
    with set_approx_sample_thresh(200):
        actual = dist.BetaBinomial(c1, c0, total_count).sample(
            jax.random.key(3), sample_shape
        )
    np.testing.assert_allclose(
        float(actual.mean()), float(expected.mean()), rtol=0.1, atol=0.3
    )
    np.testing.assert_allclose(
        float(actual.std()), float(expected.std()), rtol=0.1, atol=0.3
    )
