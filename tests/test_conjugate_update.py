"""conjugate_update identity sweep (ports the reference's
``tests/distributions/test_conjugate_update.py``): for conjugate pairs
(f, g), ``fg, logZ = f.conjugate_update(g)`` must satisfy
``f.log_prob(x) + g.log_prob(x) == fg.log_prob(x) + logZ`` pointwise
across batch and sample shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist

SHAPES = [(), (4,), (3, 2)]


def _check(f, g, sample_shape):
    fg, log_normalizer = f.conjugate_update(g)
    x = fg.sample(jax.random.key(0), sample_shape)
    lhs = f.log_prob(x) + g.log_prob(x)
    rhs = fg.log_prob(x) + log_normalizer
    np.testing.assert_allclose(
        np.asarray(lhs), np.asarray(rhs), rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize("sample_shape", SHAPES, ids=str)
@pytest.mark.parametrize("batch_shape", SHAPES, ids=str)
def test_beta_binomial(sample_shape, batch_shape):
    k1, k2, k3 = jax.random.split(jax.random.key(1), 3)
    c1 = jnp.exp(jax.random.normal(k1, batch_shape))
    c0 = jnp.exp(jax.random.normal(k2, batch_shape))
    total = 10
    obs = dist.Binomial(total, 0.2).sample(k3, sample_shape + batch_shape)
    f = dist.Beta(c1, c0)
    g = dist.Beta(1 + obs, 1 + total - obs)
    _check(f, g, sample_shape)


@pytest.mark.parametrize("sample_shape", SHAPES, ids=str)
@pytest.mark.parametrize("batch_shape", SHAPES, ids=str)
def test_dirichlet_multinomial(sample_shape, batch_shape):
    k1, k2 = jax.random.split(jax.random.key(2))
    conc = jnp.exp(jax.random.normal(k1, batch_shape + (3,)))
    probs = jnp.asarray([0.2, 0.3, 0.5])
    obs = dist.Multinomial(10, probs).sample(
        k2, sample_shape + batch_shape
    )
    f = dist.Dirichlet(conc)
    g = dist.Dirichlet(1 + obs)
    _check(f, g, sample_shape)


@pytest.mark.parametrize("sample_shape", SHAPES, ids=str)
@pytest.mark.parametrize("batch_shape", SHAPES, ids=str)
def test_gamma_poisson(sample_shape, batch_shape):
    k1, k2, k3 = jax.random.split(jax.random.key(3), 3)
    conc = jnp.exp(jax.random.normal(k1, batch_shape))
    rate = jnp.exp(jax.random.normal(k2, batch_shape))
    obs = dist.Poisson(2.0).sample(k3, sample_shape + batch_shape)
    f = dist.Gamma(conc, rate)
    g = dist.Gamma(1 + obs, jnp.ones(batch_shape))
    _check(f, g, sample_shape)
