"""ExtendedBinomial / ExtendedBetaBinomial semantics (ports the core of
the reference's ``tests/distributions/test_extended.py``): agreement
with the base distribution on its support and exact -inf off-support,
with finite gradients everywhere.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist


def test_extended_binomial():
    total_count = jnp.asarray([0.0, 1.0, 2.0, 10.0])
    probs = jnp.asarray([0.5, 0.5, 0.4, 0.2])
    d1 = dist.Binomial(total_count, probs)
    d2 = dist.ExtendedBinomial(total_count, probs)

    data = d1.sample(jax.random.key(0), (100,))
    np.testing.assert_allclose(
        np.asarray(d1.log_prob(data)),
        np.asarray(d2.log_prob(data)),
        rtol=1e-5,
    )

    extended = jnp.arange(-10.0, 20.0)[:, None]
    lp = np.asarray(d2.log_prob(extended))
    valid = np.asarray(d1.support.check(extended))
    assert ((lp > -math.inf) == valid).all()

    # gradients stay finite through off-support zeros
    def f(p):
        return jnp.sum(
            jnp.where(
                jnp.isfinite(
                    dist.ExtendedBinomial(total_count, p).log_prob(extended)
                ),
                dist.ExtendedBinomial(total_count, p).log_prob(extended),
                0.0,
            )
        )

    g = jax.grad(f)(probs)
    assert np.isfinite(np.asarray(g)).all()


def test_extended_beta_binomial():
    c1 = jnp.asarray([0.2, 1.0, 2.0])
    c0 = jnp.asarray([0.2, 1.0, 2.0])
    total = jnp.asarray([0.0, 1.0, 10.0])
    d1 = dist.BetaBinomial(c1, c0, total)
    d2 = dist.ExtendedBetaBinomial(c1, c0, total)

    data = d1.sample(jax.random.key(1), (100,))
    np.testing.assert_allclose(
        np.asarray(d1.log_prob(data)),
        np.asarray(d2.log_prob(data)),
        rtol=1e-4,
        atol=1e-5,
    )
    extended = jnp.arange(-5.0, 15.0)[:, None]
    lp = np.asarray(d2.log_prob(extended))
    valid = np.asarray(d1.support.check(extended))
    assert ((lp > -math.inf) == valid).all()
