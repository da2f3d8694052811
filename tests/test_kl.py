"""KL-divergence registry sweep: every analytic pair against a
Monte-Carlo estimate of E_p[log p - log q], plus dispatch semantics
(MRO specificity, Independent/Masked wrappers, Delta, the fallback).

Mirrors the reference's ``tests/distributions/test_kl.py`` strategy
(MC-vs-analytic agreement over the registered-pair matrix); the
registry itself follows ``torch.distributions.kl`` dispatch semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.distributions import kl_divergence, register_kl

N_MC = 200_000


def _mc_kl(p, q, key=0, n=N_MC):
    x = p.sample(jax.random.key(key), (n,))
    return np.asarray((p.log_prob(x) - q.log_prob(x)).mean(0))


# (p, q, rtol/atol-ish tolerance on the MC comparison)
PAIRS = [
    (dist.Normal(0.5, 1.2), dist.Normal(-0.3, 2.0), 0.02),
    (dist.Bernoulli(probs=0.3), dist.Bernoulli(probs=0.6), 0.02),
    (
        dist.Categorical(probs=jnp.array([0.2, 0.5, 0.3])),
        dist.Categorical(probs=jnp.array([0.4, 0.2, 0.4])),
        0.02,
    ),
    (dist.Gamma(2.0, 1.5), dist.Gamma(3.0, 1.0), 0.02),
    (dist.Beta(2.0, 3.0), dist.Beta(4.0, 2.0), 0.02),
    (
        dist.Dirichlet(jnp.array([2.0, 3.0, 4.0])),
        dist.Dirichlet(jnp.array([1.0, 1.0, 1.0])),
        0.02,
    ),
    (
        dist.MultivariateNormal(
            jnp.array([0.0, 1.0]),
            jnp.array([[1.0, 0.3], [0.3, 2.0]]),
        ),
        dist.MultivariateNormal(
            jnp.array([0.5, -0.5]),
            jnp.array([[2.0, -0.2], [-0.2, 1.0]]),
        ),
        0.02,
    ),
    (dist.Exponential(1.5), dist.Exponential(0.7), 0.02),
    (dist.Poisson(3.0), dist.Poisson(5.0), 0.02),
    (dist.Uniform(0.0, 1.0), dist.Uniform(-0.5, 2.0), 0.02),
    (dist.LogNormal(0.2, 0.8), dist.LogNormal(-0.1, 1.1), 0.02),
    (dist.Geometric(probs=0.4), dist.Geometric(probs=0.2), 0.02),
]


@pytest.mark.parametrize(
    "p,q,tol", PAIRS, ids=[type(p).__name__ for p, _, _ in PAIRS]
)
def test_analytic_matches_monte_carlo(p, q, tol):
    analytic = np.asarray(kl_divergence(p, q))
    mc = _mc_kl(p, q)
    assert analytic >= -1e-6  # same-family KL is nonnegative
    np.testing.assert_allclose(
        analytic, mc, rtol=tol, atol=3 * tol * max(1.0, abs(float(mc)))
    )


def test_batch_shapes_broadcast():
    p = dist.Normal(jnp.zeros((3, 1)), jnp.ones((3, 1)))
    q = dist.Normal(jnp.arange(4.0), 2.0)
    kl = kl_divergence(p, q)
    assert kl.shape == (3, 4)
    # element [i, j] equals the scalar pair's KL
    scalar = kl_divergence(dist.Normal(0.0, 1.0), dist.Normal(2.0, 2.0))
    np.testing.assert_allclose(kl[0, 2], scalar, rtol=1e-6)


def test_independent_sums_event_dims():
    base_p = dist.Normal(jnp.zeros(5), 1.0)
    base_q = dist.Normal(jnp.ones(5), 2.0)
    kl_iid = kl_divergence(base_p.to_event(1), base_q.to_event(1))
    np.testing.assert_allclose(
        kl_iid, kl_divergence(base_p, base_q).sum(), rtol=1e-6
    )
    assert kl_iid.shape == ()


def test_masked_zeroes_masked_terms():
    mask = jnp.array([True, False, True])
    p = dist.Normal(jnp.zeros(3), 1.0).mask(mask)
    q = dist.Normal(jnp.ones(3), 2.0).mask(mask)
    kl = kl_divergence(p, q)
    unmasked = kl_divergence(
        dist.Normal(jnp.zeros(3), 1.0), dist.Normal(jnp.ones(3), 2.0)
    )
    np.testing.assert_allclose(kl, jnp.where(mask, unmasked, 0.0), rtol=1e-6)


def test_delta_vs_distribution():
    p = dist.Delta(jnp.asarray(0.7))
    q = dist.Normal(0.0, 1.0)
    np.testing.assert_allclose(
        kl_divergence(p, q), -q.log_prob(jnp.asarray(0.7)), rtol=1e-6
    )


def test_unregistered_pair_raises():
    with pytest.raises(NotImplementedError):
        kl_divergence(dist.Cauchy(0.0, 1.0), dist.Gamma(1.0, 1.0))


def test_register_kl_most_specific_wins():
    class MyNormal(dist.Normal):
        pass

    # base-pair rule applies to the subclass first...
    sub = MyNormal(0.0, 1.0)
    base = dist.Normal(1.0, 2.0)
    expected = kl_divergence(dist.Normal(0.0, 1.0), base)
    np.testing.assert_allclose(kl_divergence(sub, base), expected)

    # ...until a more specific registration takes over
    @register_kl(MyNormal, dist.Normal)
    def _custom(p, q):
        return jnp.asarray(42.0)

    try:
        np.testing.assert_allclose(kl_divergence(sub, base), 42.0)
        # plain Normal pairs are untouched
        np.testing.assert_allclose(
            kl_divergence(dist.Normal(0.0, 1.0), base), expected
        )
    finally:
        from pyro_tpu.distributions.kl import _KL_REGISTRY

        _KL_REGISTRY.pop((MyNormal, dist.Normal), None)


def test_kl_self_is_zero():
    for p, _, _ in PAIRS:
        np.testing.assert_allclose(
            np.asarray(kl_divergence(p, p)), 0.0, atol=1e-5
        )
