"""Distribution correctness: log_prob vs scipy, sampling moments, shapes.

Mirrors the reference strategy (``tests/distributions/``): parameterized
fixtures checking shape contracts, density agreement with an independent
implementation, and sample moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

import pyro_tpu.distributions as dist

KEY = jax.random.key(0)


# (dist factory, scipy logpdf fn, test points)
CASES = [
    (
        lambda: dist.Normal(1.0, 2.0),
        lambda x: sps.norm.logpdf(x, 1.0, 2.0),
        [-1.0, 0.0, 2.5],
    ),
    (
        lambda: dist.LogNormal(0.5, 1.2),
        lambda x: sps.lognorm.logpdf(x, 1.2, scale=np.exp(0.5)),
        [0.1, 1.0, 5.0],
    ),
    (
        lambda: dist.Uniform(-2.0, 3.0),
        lambda x: sps.uniform.logpdf(x, -2.0, 5.0),
        [-1.0, 0.0, 2.5],
    ),
    (
        lambda: dist.Exponential(2.5),
        lambda x: sps.expon.logpdf(x, scale=1 / 2.5),
        [0.1, 1.0, 3.0],
    ),
    (
        lambda: dist.Gamma(2.0, 3.0),
        lambda x: sps.gamma.logpdf(x, 2.0, scale=1 / 3.0),
        [0.5, 1.0, 2.0],
    ),
    (
        lambda: dist.InverseGamma(3.0, 2.0),
        lambda x: sps.invgamma.logpdf(x, 3.0, scale=2.0),
        [0.5, 1.0, 2.0],
    ),
    (
        lambda: dist.Beta(2.0, 3.0),
        lambda x: sps.beta.logpdf(x, 2.0, 3.0),
        [0.1, 0.5, 0.9],
    ),
    (
        lambda: dist.Chi2(3.0),
        lambda x: sps.chi2.logpdf(x, 3.0),
        [0.5, 2.0, 5.0],
    ),
    (
        lambda: dist.StudentT(4.0, 1.0, 2.0),
        lambda x: sps.t.logpdf(x, 4.0, 1.0, 2.0),
        [-1.0, 1.0, 3.0],
    ),
    (
        lambda: dist.Cauchy(0.5, 1.5),
        lambda x: sps.cauchy.logpdf(x, 0.5, 1.5),
        [-2.0, 0.5, 4.0],
    ),
    (
        lambda: dist.HalfNormal(2.0),
        lambda x: sps.halfnorm.logpdf(x, scale=2.0),
        [0.1, 1.0, 3.0],
    ),
    (
        lambda: dist.HalfCauchy(2.0),
        lambda x: sps.halfcauchy.logpdf(x, scale=2.0),
        [0.1, 1.0, 3.0],
    ),
    (
        lambda: dist.Laplace(0.5, 2.0),
        lambda x: sps.laplace.logpdf(x, 0.5, 2.0),
        [-1.0, 0.5, 3.0],
    ),
    (
        lambda: dist.Gumbel(0.5, 2.0),
        lambda x: sps.gumbel_r.logpdf(x, 0.5, 2.0),
        [-1.0, 0.5, 3.0],
    ),
    (
        lambda: dist.Logistic(0.5, 2.0),
        lambda x: sps.logistic.logpdf(x, 0.5, 2.0),
        [-1.0, 0.5, 3.0],
    ),
    (
        lambda: dist.Weibull(2.0, 1.5),
        lambda x: sps.weibull_min.logpdf(x, 1.5, scale=2.0),
        [0.5, 1.5, 3.0],
    ),
    (
        lambda: dist.Pareto(1.5, 2.5),
        lambda x: sps.pareto.logpdf(x, 2.5, scale=1.5),
        [2.0, 3.0, 5.0],
    ),
    (
        lambda: dist.VonMises(0.5, 2.0),
        lambda x: sps.vonmises.logpdf(x, 2.0, loc=0.5),
        [-1.0, 0.5, 2.0],
    ),
    (
        lambda: dist.Poisson(3.5),
        lambda x: sps.poisson.logpmf(x, 3.5),
        [0.0, 2.0, 6.0],
    ),
    (
        lambda: dist.Bernoulli(probs=0.3),
        lambda x: sps.bernoulli.logpmf(x, 0.3),
        [0.0, 1.0],
    ),
    (
        lambda: dist.Binomial(10, probs=0.3),
        lambda x: sps.binom.logpmf(x, 10, 0.3),
        [0.0, 3.0, 10.0],
    ),
    (
        lambda: dist.Geometric(probs=0.3),
        lambda x: sps.geom.logpmf(x + 1, 0.3),
        [0.0, 2.0, 5.0],
    ),
    (
        lambda: dist.NegativeBinomial(5.0, probs=0.4),
        lambda x: sps.nbinom.logpmf(x, 5, 0.6),
        [0.0, 3.0, 8.0],
    ),
    (
        lambda: dist.GammaPoisson(5.0, 1.5),
        lambda x: sps.nbinom.logpmf(x, 5, 1.5 / 2.5),
        [0.0, 3.0, 8.0],
    ),
    (
        lambda: dist.BetaBinomial(2.0, 3.0, 10),
        lambda x: sps.betabinom.logpmf(x, 10, 2.0, 3.0),
        [0.0, 4.0, 10.0],
    ),
    (
        lambda: dist.Kumaraswamy(2.0, 3.0),
        lambda x: np.log(2.0 * 3.0)
        + (2.0 - 1) * np.log(x)
        + (3.0 - 1) * np.log1p(-np.asarray(x) ** 2.0),
        [0.2, 0.5, 0.8],
    ),
]


@pytest.mark.parametrize(
    "case", CASES, ids=[c[0]().__class__.__name__ for c in CASES]
)
def test_log_prob_matches_scipy(case):
    factory, scipy_lp, points = case
    d = factory()
    for x in points:
        actual = jax.device_get(d.log_prob(jnp.asarray(x)))
        expected = scipy_lp(x)
        assert np.allclose(actual, expected, rtol=1e-4, atol=1e-5), (
            d,
            x,
            actual,
            expected,
        )


@pytest.mark.parametrize(
    "case", CASES, ids=[c[0]().__class__.__name__ for c in CASES]
)
def test_sample_moments(case):
    factory, _, _ = case
    d = factory()
    try:
        mean, var = d.mean, d.variance
    except NotImplementedError:
        return
    mean, var = np.asarray(mean), np.asarray(var)
    if not (np.isfinite(mean).all() and np.isfinite(var).all()):
        return
    n = 20000
    samples = np.asarray(jax.device_get(d.sample(KEY, (n,))))
    est_mean = samples.mean(0)
    tol = 4 * np.sqrt(var / n) + 1e-3
    assert np.abs(est_mean - mean).max() < np.max(tol) * 3, (
        d,
        est_mean,
        mean,
    )


@pytest.mark.parametrize(
    "case", CASES, ids=[c[0]().__class__.__name__ for c in CASES]
)
def test_shapes(case):
    factory, _, _ = case
    d = factory()
    assert d.shape((7,)) == (7,) + d.batch_shape + d.event_shape
    x = d.sample(KEY, (7,))
    assert x.shape == d.shape((7,))
    lp = d.log_prob(x)
    assert lp.shape == (7,) + d.batch_shape
    # expand
    d2 = d.expand((5,) + d.batch_shape)
    assert d2.batch_shape == (5,) + d.batch_shape
    x2 = d2.sample(KEY)
    assert x2.shape == d2.shape()


def test_mvn_matches_scipy():
    loc = np.array([1.0, -0.5])
    cov = np.array([[2.0, 0.3], [0.3, 1.0]])
    d = dist.MultivariateNormal(jnp.asarray(loc), covariance_matrix=jnp.asarray(cov))
    x = np.array([0.5, 0.5])
    assert np.allclose(
        jax.device_get(d.log_prob(jnp.asarray(x))),
        sps.multivariate_normal.logpdf(x, loc, cov),
        rtol=1e-5,
    )
    samples = np.asarray(d.sample(KEY, (20000,)))
    assert np.allclose(samples.mean(0), loc, atol=0.05)
    assert np.allclose(np.cov(samples.T), cov, atol=0.1)


def test_mvn_parameterizations_agree():
    loc = jnp.array([1.0, -0.5])
    cov = jnp.array([[2.0, 0.3], [0.3, 1.0]])
    x = jnp.array([0.5, 0.5])
    d1 = dist.MultivariateNormal(loc, covariance_matrix=cov)
    d2 = dist.MultivariateNormal(loc, precision_matrix=jnp.linalg.inv(cov))
    d3 = dist.MultivariateNormal(loc, scale_tril=jnp.linalg.cholesky(cov))
    lps = [jax.device_get(d.log_prob(x)) for d in (d1, d2, d3)]
    assert np.allclose(lps[0], lps[1], rtol=1e-4)
    assert np.allclose(lps[0], lps[2], rtol=1e-5)


def test_lowrank_mvn_matches_full():
    loc = jnp.array([0.0, 1.0, -1.0])
    W = jnp.array([[1.0], [0.5], [-0.3]])
    D = jnp.array([0.5, 0.8, 1.2])
    d_lr = dist.LowRankMultivariateNormal(loc, W, D)
    cov = W @ W.T + jnp.diag(D)
    d_full = dist.MultivariateNormal(loc, covariance_matrix=cov)
    x = jnp.array([0.5, 0.5, 0.5])
    assert np.allclose(
        jax.device_get(d_lr.log_prob(x)),
        jax.device_get(d_full.log_prob(x)),
        rtol=1e-5,
    )


def test_dirichlet_matches_scipy():
    conc = np.array([1.5, 2.0, 3.0])
    d = dist.Dirichlet(jnp.asarray(conc))
    x = np.array([0.2, 0.3, 0.5])
    assert np.allclose(
        jax.device_get(d.log_prob(jnp.asarray(x))),
        sps.dirichlet.logpdf(x, conc),
        rtol=1e-5,
    )
    samples = np.asarray(d.sample(KEY, (20000,)))
    assert np.allclose(samples.mean(0), conc / conc.sum(), atol=0.02)


def test_categorical():
    probs = jnp.array([0.1, 0.2, 0.7])
    d = dist.Categorical(probs=probs)
    samples = np.asarray(d.sample(KEY, (20000,)))
    freq = np.bincount(samples, minlength=3) / 20000
    assert np.allclose(freq, np.asarray(probs), atol=0.02)
    lp = jax.device_get(d.log_prob(jnp.array([0, 1, 2])))
    assert np.allclose(lp, np.log(np.asarray(probs)), rtol=1e-5)
    support = d.enumerate_support()
    assert support.shape == (3,)


def test_multinomial_logprob():
    probs = np.array([0.2, 0.3, 0.5])
    d = dist.Multinomial(10, probs=jnp.asarray(probs))
    x = np.array([2.0, 3.0, 5.0])
    assert np.allclose(
        jax.device_get(d.log_prob(jnp.asarray(x))),
        sps.multinomial.logpmf(x, 10, probs),
        rtol=1e-5,
    )


def test_independent():
    d = dist.Normal(jnp.zeros((3, 4)), 1.0).to_event(1)
    assert d.batch_shape == (3,)
    assert d.event_shape == (4,)
    x = d.sample(KEY)
    assert d.log_prob(x).shape == (3,)
    d2 = dist.Normal(jnp.zeros((3, 4)), 1.0).to_event(2)
    assert d2.log_prob(x).shape == ()


def test_masked():
    d = dist.Normal(0.0, 1.0).expand((4,)).mask(
        jnp.array([True, False, True, False])
    )
    lp = d.log_prob(jnp.zeros(4))
    assert lp[1] == 0.0 and lp[3] == 0.0
    assert lp[0] != 0.0


def test_delta():
    d = dist.Delta(jnp.array([1.0, 2.0]), event_dim=1)
    assert d.event_shape == (2,)
    x = d.sample(KEY)
    assert np.allclose(x, [1.0, 2.0])
    assert np.allclose(d.log_prob(x), 0.0)


def test_lkj_cholesky():
    d = dist.LKJCholesky(3, 2.0)
    L = d.sample(KEY)
    assert L.shape == (3, 3)
    # rows unit-norm → valid correlation cholesky
    corr = L @ L.T
    assert np.allclose(np.diag(np.asarray(corr)), 1.0, atol=1e-5)
    assert np.isfinite(jax.device_get(d.log_prob(L)))


def test_projected_normal():
    d = dist.ProjectedNormal(jnp.array([2.0, 0.0, 0.0]))
    x = d.sample(KEY, (100,))
    assert np.allclose(np.linalg.norm(np.asarray(x), axis=-1), 1.0, atol=1e-5)
    assert np.isfinite(jax.device_get(d.log_prob(x))).all()


def test_transformed_distribution_logprob():
    base = dist.Normal(0.0, 1.0)
    d = dist.TransformedDistribution(
        base, dist.transforms.ExpTransform()
    )
    x = jnp.array(2.0)
    assert np.allclose(
        jax.device_get(d.log_prob(x)),
        sps.lognorm.logpdf(2.0, 1.0),
        rtol=1e-5,
    )


def test_distribution_is_pytree():
    d = dist.Normal(jnp.array([0.0, 1.0]), jnp.array([1.0, 2.0]))
    leaves, treedef = jax.tree_util.tree_flatten(d)
    d2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(d2, dist.Normal)
    assert np.allclose(d2.loc, d.loc)

    # vmap over distribution params
    def lp(loc):
        return dist.Normal(loc, 1.0).log_prob(jnp.array(0.0))

    out = jax.vmap(lp)(jnp.arange(3.0))
    assert out.shape == (3,)
