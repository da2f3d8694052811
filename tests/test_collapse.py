"""Native ``poutine.collapse`` tests.

Mirrors the reference's funsor-gated contract
(``/root/reference/tests/infer/test_gradient.py:396-423``) and validates
the closed-form conjugate marginals against independent ground truths
(compound distributions, Pólya-urn predictives, multivariate normals).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine


def test_collapse_beta_binomial():
    """The reference contract: trace keeps the latent site scoring the
    BetaBinomial marginal; the observed site disappears."""
    total_count = 10
    data = jnp.asarray(3.0)
    c1, c0 = jnp.asarray(0.5), jnp.asarray(1.5)

    def model1():
        with poutine.collapse():
            probs = pyro.sample("probs", dist.Beta(c1, c0))
            pyro.sample(
                "obs", dist.Binomial(total_count, probs), obs=data
            )

    def model2():
        pyro.sample(
            "obs", dist.BetaBinomial(c1, c0, total_count), obs=data
        )

    trace1 = poutine.trace(poutine.seed(model1, 0)).get_trace()
    trace2 = poutine.trace(poutine.seed(model2, 0)).get_trace()
    assert "probs" in trace1.nodes
    assert "obs" not in trace1.nodes
    assert "probs" not in trace2.nodes
    assert "obs" in trace2.nodes

    logp1 = float(trace1.log_prob_sum())
    logp2 = float(trace2.log_prob_sum())
    assert np.allclose(logp1, logp2, atol=1e-5), (logp1, logp2)


def test_collapse_beta_binomial_gradients():
    """Gradients w.r.t. the prior hyperparameters flow through the
    collapsed marginal and match the compound BetaBinomial's."""
    total_count = 10
    data = jnp.asarray(3.0)

    def lp_collapsed(c):
        def model():
            with poutine.collapse():
                probs = pyro.sample("probs", dist.Beta(c[0], c[1]))
                pyro.sample(
                    "obs", dist.Binomial(total_count, probs), obs=data
                )

        return poutine.trace(
            poutine.seed(model, 0)
        ).get_trace().log_prob_sum()

    def lp_compound(c):
        return dist.BetaBinomial(c[0], c[1], total_count).log_prob(data)

    c = jnp.asarray([0.5, 1.5])
    g1 = jax.grad(lp_collapsed)(c)
    g2 = jax.grad(lp_compound)(c)
    assert np.allclose(np.asarray(g1), np.asarray(g2), atol=1e-4), (g1, g2)


def test_collapse_beta_bernoulli_pooled():
    """A scalar Beta latent shared across a batch of Bernoulli
    observations: marginal is NOT a product of independent compounds."""
    x = jnp.asarray([1.0, 1.0, 0.0, 1.0, 0.0])
    a, b = 2.0, 3.0

    def model():
        with poutine.collapse():
            p = pyro.sample("p", dist.Beta(a, b))
            with pyro.plate("data", 5):
                pyro.sample("obs", dist.Bernoulli(p), obs=x)

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    logp = float(tr.log_prob_sum())
    # Pólya urn sequential predictive
    expected = 0.0
    a_, b_ = a, b
    for xi in np.asarray(x):
        p_pred = a_ / (a_ + b_)
        expected += np.log(p_pred if xi else 1 - p_pred)
        a_, b_ = a_ + xi, b_ + (1 - xi)
    assert np.allclose(logp, expected, atol=1e-5), (logp, expected)


def test_collapse_gamma_poisson_pooled():
    x = jnp.asarray([2.0, 0.0, 3.0, 1.0])
    a, b = 1.5, 2.0

    def model():
        with poutine.collapse():
            lam = pyro.sample("lam", dist.Gamma(a, b))
            with pyro.plate("data", 4):
                pyro.sample("obs", dist.Poisson(lam), obs=x)

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    logp = float(tr.log_prob_sum())
    # quadrature ground truth over the Gamma prior
    from scipy import integrate, stats

    xs = np.asarray(x)

    def integrand(lam):
        return stats.gamma.pdf(lam, a, scale=1 / b) * np.prod(
            stats.poisson.pmf(xs, lam)
        )

    expected = np.log(integrate.quad(integrand, 0, 60)[0])
    assert np.allclose(logp, expected, atol=1e-4), (logp, expected)


def test_collapse_gamma_exponential():
    x = jnp.asarray([0.5, 1.2, 0.3])
    a, b = 2.0, 1.0

    def model():
        with poutine.collapse():
            lam = pyro.sample("lam", dist.Gamma(a, b))
            with pyro.plate("data", 3):
                pyro.sample("obs", dist.Exponential(lam), obs=x)

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    logp = float(tr.log_prob_sum())
    from scipy import integrate, stats

    xs = np.asarray(x)

    def integrand(lam):
        return stats.gamma.pdf(lam, a, scale=1 / b) * np.prod(
            stats.expon.pdf(xs, scale=1 / lam)
        )

    expected = np.log(integrate.quad(integrand, 0, 80)[0])
    assert np.allclose(logp, expected, atol=1e-4), (logp, expected)


def test_collapse_dirichlet_categorical():
    """Categorical normalizes its probs (identity lost) — exercises the
    eager value-equality fallback; ground truth is the Pólya urn."""
    alpha = jnp.asarray([1.0, 2.0, 0.5])
    x = jnp.asarray([0, 2, 2, 1, 0])

    def model():
        with poutine.collapse():
            p = pyro.sample("p", dist.Dirichlet(alpha))
            with pyro.plate("data", 5):
                pyro.sample("obs", dist.Categorical(p), obs=x)

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    logp = float(tr.log_prob_sum())
    a = np.asarray(alpha, dtype=np.float64).copy()
    expected = 0.0
    for xi in np.asarray(x):
        expected += np.log(a[xi] / a.sum())
        a[xi] += 1.0
    assert np.allclose(logp, expected, atol=1e-5), (logp, expected)


def test_collapse_dirichlet_multinomial():
    alpha = jnp.asarray([1.0, 2.0, 0.5])
    x = jnp.asarray([3.0, 1.0, 2.0])

    def model():
        with poutine.collapse():
            p = pyro.sample("p", dist.Dirichlet(alpha))
            pyro.sample("obs", dist.Multinomial(6, p), obs=x)

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    logp = float(tr.log_prob_sum())
    expected = float(
        dist.DirichletMultinomial(alpha, total_count=6).log_prob(x)
    )
    assert np.allclose(logp, expected, atol=1e-5), (logp, expected)


def test_collapse_normal_normal_pooled():
    """Scalar Normal latent mean shared across observations: compare to
    the exact MVN with covariance s^2 I + t^2 11^T."""
    m, t, s = 0.5, 1.3, 0.7
    x = jnp.asarray([0.1, 1.4, -0.3, 0.8])

    def model():
        with poutine.collapse():
            z = pyro.sample("z", dist.Normal(m, t))
            with pyro.plate("data", 4):
                pyro.sample("obs", dist.Normal(z, s), obs=x)

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    logp = float(tr.log_prob_sum())
    cov = s**2 * np.eye(4) + t**2 * np.ones((4, 4))
    from scipy import stats

    expected = stats.multivariate_normal.logpdf(
        np.asarray(x), mean=m * np.ones(4), cov=cov
    )
    assert np.allclose(logp, expected, atol=1e-4), (logp, expected)


def test_collapse_elementwise_latents():
    """Latents sampled inside the same plate as the obs: marginal is the
    elementwise product of compounds."""
    a = jnp.asarray([1.0, 2.0, 3.0])
    b = jnp.asarray([2.0, 1.0, 1.5])
    x = jnp.asarray([1.0, 0.0, 1.0])

    def model():
        with poutine.collapse():
            with pyro.plate("data", 3):
                p = pyro.sample("p", dist.Beta(a, b))
                pyro.sample("obs", dist.Bernoulli(p), obs=x)

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    logp = float(tr.log_prob_sum())
    expected = float(
        jnp.sum(dist.BetaBinomial(a, b, 1).log_prob(x))
    )
    assert np.allclose(logp, expected, atol=1e-5), (logp, expected)


def test_collapse_unmatched_latent_scores_prior():
    """A latent that never reaches a recognized likelihood scores under
    its prior — collapse degrades to a no-op."""

    def model():
        with poutine.collapse():
            z = pyro.sample("z", dist.Normal(0.0, 1.0))
            pyro.sample("y", dist.Cauchy(z, 1.0), obs=jnp.asarray(0.3))

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    assert "z" in tr.nodes and "y" in tr.nodes
    z = tr.nodes["z"]["value"]
    expected = float(
        dist.Normal(0.0, 1.0).log_prob(z)
        + dist.Cauchy(z, 1.0).log_prob(jnp.asarray(0.3))
    )
    assert np.allclose(float(tr.log_prob_sum()), expected, atol=1e-5)


def test_collapse_under_jit():
    """Identity tracking works on tracers inside jit."""
    total_count = 8

    @jax.jit
    def lp(c1, c0, data):
        def model():
            with poutine.collapse():
                probs = pyro.sample("probs", dist.Beta(c1, c0))
                pyro.sample(
                    "obs", dist.Binomial(total_count, probs), obs=data
                )

        return poutine.trace(
            poutine.seed(model, 0)
        ).get_trace().log_prob_sum()

    actual = float(lp(0.5, 1.5, jnp.asarray(3.0)))
    expected = float(
        dist.BetaBinomial(0.5, 1.5, total_count).log_prob(jnp.asarray(3.0))
    )
    assert np.allclose(actual, expected, atol=1e-5), (actual, expected)
