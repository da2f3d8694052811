"""Tests for the catalog-completing distributions (more.py, conditional.py,
stable_log_prob.py) — validated against scipy / numerical integration /
brute force."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats

import pyro_tpu.distributions as dist


def _normalization(d, lo, hi, n=20001):
    xs = jnp.linspace(lo, hi, n)
    lp = d.log_prob(xs)
    return float(jnp.trapezoid(jnp.exp(lp), xs))


def test_continuous_bernoulli():
    for p in [0.2, 0.5, 0.7]:
        d = dist.ContinuousBernoulli(jnp.asarray(p))
        assert abs(_normalization(d, 0.0, 1.0) - 1.0) < 1e-3
        s = d.rsample(jax.random.key(0), (5000,))
        assert 0 <= float(s.min()) and float(s.max()) <= 1
        assert abs(float(s.mean()) - float(d.mean)) < 0.02


def test_fisher_snedecor_vs_scipy():
    d1, d2 = 5.0, 8.0
    d = dist.FisherSnedecor(d1, d2)
    xs = np.linspace(0.05, 6.0, 50)
    expected = scipy.stats.f.logpdf(xs, d1, d2)
    actual = np.asarray(d.log_prob(jnp.asarray(xs)))
    assert np.allclose(actual, expected, atol=1e-4)
    s = d.rsample(jax.random.key(1), (20000,))
    assert abs(float(jnp.mean(s)) - d2 / (d2 - 2)) < 0.1


def test_logistic_normal_simplex():
    d = dist.LogisticNormal(jnp.zeros(3), jnp.ones(3))
    s = d.rsample(jax.random.key(2), (100,))
    assert s.shape == (100, 4)
    assert np.allclose(np.asarray(s.sum(-1)), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(d.log_prob(s))).all()


def test_wishart_vs_scipy():
    df = 7.0
    S = np.array([[2.0, 0.5], [0.5, 1.0]])
    d = dist.Wishart(df, covariance_matrix=jnp.asarray(S))
    V = np.array([[3.0, 0.2], [0.2, 2.0]])
    expected = scipy.stats.wishart.logpdf(V, df, S)
    actual = float(d.log_prob(jnp.asarray(V)))
    assert abs(actual - expected) < 1e-3
    s = d.rsample(jax.random.key(3), (4000,))
    mean = np.asarray(s).mean(0)
    assert np.allclose(mean, df * S, rtol=0.1)


def test_lkj_dim2_density():
    """For dim=2 the LKJ density of the off-diagonal r is
    proportional to (1 - r^2)^(eta - 1)."""
    eta = 2.5
    d = dist.LKJ(2, eta)
    rs = np.linspace(-0.95, 0.95, 21)
    lps = []
    for r in rs:
        m = jnp.asarray([[1.0, r], [r, 1.0]])
        lps.append(float(d.log_prob(m)))
    lps = np.asarray(lps)
    expected = (eta - 1) * np.log1p(-(rs**2))
    # equal up to a constant
    diff = lps - expected
    assert np.allclose(diff, diff[0], atol=1e-3)
    # samples are valid correlation matrices
    s = d.sample(jax.random.key(4), (50,))
    diag = np.asarray(jnp.diagonal(s, axis1=-2, axis2=-1))
    assert np.allclose(diag, 1.0, atol=1e-5)
    evals = np.linalg.eigvalsh(np.asarray(s))
    assert (evals > -1e-6).all()


def test_lkj_corr_cholesky_alias():
    d = dist.LKJCorrCholesky(3, jnp.asarray(1.5))
    s = d.sample(jax.random.key(5))
    assert s.shape == (3, 3)
    assert np.allclose(np.asarray(jnp.linalg.norm(s, axis=-1)), 1.0, atol=1e-5)


def test_skew_logistic():
    d = dist.SkewLogistic(0.5, 1.2, 2.0)
    assert abs(_normalization(d, -30.0, 40.0) - 1.0) < 1e-3
    # asymmetry=1 reduces to Logistic
    d1 = dist.SkewLogistic(0.0, 1.0, 1.0)
    d2 = dist.Logistic(0.0, 1.0)
    xs = jnp.linspace(-5, 5, 11)
    assert np.allclose(
        np.asarray(d1.log_prob(xs)), np.asarray(d2.log_prob(xs)), atol=1e-5
    )
    # cdf/icdf roundtrip + sampling
    u = jnp.asarray([0.1, 0.5, 0.9])
    assert np.allclose(np.asarray(d.cdf(d.icdf(u))), np.asarray(u), atol=1e-5)
    s = d.rsample(jax.random.key(6), (20000,))
    assert abs(float(jnp.mean(d.cdf(s))) - 0.5) < 0.02


def test_soft_asymmetric_laplace():
    d = dist.SoftAsymmetricLaplace(0.3, 1.0, asymmetry=1.5, softness=0.8)
    assert abs(_normalization(d, -40.0, 40.0) - 1.0) < 1e-3
    s = d.rsample(jax.random.key(7), (50000,))
    assert abs(float(jnp.mean(s)) - float(d.mean)) < 0.05
    assert abs(float(jnp.var(s)) - float(d.variance)) < 0.2


def test_truncated_polya_gamma():
    d = dist.TruncatedPolyaGamma(jnp.zeros(()))
    s = d.sample(jax.random.key(8), (1000,))
    assert float(s.min()) > 0 and float(s.max()) <= d.truncation_point
    xs = jnp.linspace(0.01, 2.49, 500)
    lp = d.log_prob(xs)
    assert np.isfinite(np.asarray(lp)).all()
    # density approximately normalizes on the truncation interval
    z = float(jnp.trapezoid(jnp.exp(lp), xs))
    assert abs(z - 1.0) < 0.05


def test_grouped_normal_normal_vs_dense():
    """log_prob == dense MVN with covariance s_p^2 * J_group + diag(s_o^2)."""
    rng = np.random.RandomState(0)
    num_groups, num_data = 3, 6
    prior_loc = jnp.asarray(rng.randn(num_groups))
    prior_scale = jnp.asarray(rng.rand(num_groups) + 0.5)
    obs_scale = jnp.asarray(rng.rand(num_data) + 0.5)
    group_idx = jnp.asarray([0, 1, 1, 2, 0, 2])
    value = jnp.asarray(rng.randn(num_data))

    d = dist.GroupedNormalNormal(prior_loc, prior_scale, obs_scale, group_idx)
    actual = float(d.log_prob(value))

    gi = np.asarray(group_idx)
    mean = np.asarray(prior_loc)[gi]
    same = gi[:, None] == gi[None, :]
    cov = same * np.asarray(prior_scale)[gi] ** 2 * np.ones(
        (num_data, num_data)
    ) * (np.asarray(prior_scale)[gi][:, None] / np.asarray(prior_scale)[gi])
    cov = (np.asarray(prior_scale)[gi][:, None] ** 2) * same
    cov = cov + np.diag(np.asarray(obs_scale) ** 2)
    expected = scipy.stats.multivariate_normal.logpdf(
        np.asarray(value), mean, cov
    )
    assert abs(actual - expected) < 1e-3

    # posterior matches conjugate formula for one group
    post = d.get_posterior(value)
    g0 = gi == 0
    prec = 1 / float(prior_scale[0]) ** 2 + np.sum(
        1 / np.asarray(obs_scale)[g0] ** 2
    )
    loc = (
        float(prior_loc[0]) / float(prior_scale[0]) ** 2
        + np.sum(np.asarray(value)[g0] / np.asarray(obs_scale)[g0] ** 2)
    ) / prec
    assert abs(float(post.loc[0]) - loc) < 1e-4
    assert abs(float(post.scale[0]) - prec**-0.5) < 1e-5


def test_nan_masked_normal():
    d = dist.NanMaskedNormal(jnp.asarray([0.0, 1.0, 2.0]), 1.0)
    value = jnp.asarray([0.5, jnp.nan, 2.5])
    lp = d.log_prob(value)
    plain = dist.Normal(jnp.asarray([0.0, 2.0]), 1.0).log_prob(
        jnp.asarray([0.5, 2.5])
    )
    assert np.allclose(float(lp[0]) + float(lp[2]), float(plain.sum()), atol=1e-5)
    assert float(lp[1]) == 0.0


def test_nan_masked_mvn():
    rng = np.random.RandomState(1)
    A = rng.randn(3, 3)
    cov = A @ A.T + np.eye(3)
    loc = rng.randn(3)
    d = dist.NanMaskedMultivariateNormal(
        jnp.asarray(loc), covariance_matrix=jnp.asarray(cov)
    )
    value = jnp.asarray([0.3, jnp.nan, -0.7])
    actual = float(d.log_prob(value))
    expected = scipy.stats.multivariate_normal.logpdf(
        [0.3, -0.7], loc[[0, 2]], cov[np.ix_([0, 2], [0, 2])]
    )
    assert abs(actual - expected) < 1e-3
    # no NaNs: agrees with plain MVN
    v2 = jnp.asarray([0.1, 0.2, 0.3])
    expected2 = scipy.stats.multivariate_normal.logpdf(
        np.asarray(v2), loc, cov
    )
    assert abs(float(d.log_prob(v2)) - expected2) < 1e-3


def test_mixture_of_diag_normals():
    locs = jnp.asarray([[-2.0, 0.0], [2.0, 1.0]])
    scales = jnp.asarray([[0.5, 1.0], [1.0, 0.5]])
    logits = jnp.asarray([0.3, -0.2])
    d = dist.MixtureOfDiagNormals(locs, scales, logits)
    x = jnp.asarray([0.1, -0.4])
    probs = jax.nn.softmax(logits)
    expected = np.log(sum(
        float(probs[k])
        * np.exp(
            scipy.stats.norm.logpdf(
                np.asarray(x), np.asarray(locs[k]), np.asarray(scales[k])
            ).sum()
        )
        for k in range(2)
    ))
    assert abs(float(d.log_prob(x)) - expected) < 1e-4
    s = d.sample(jax.random.key(9), (5000,))
    assert s.shape == (5000, 2)
    # component frequencies roughly match mixing probs (well separated)
    frac = float(jnp.mean(s[:, 0] > 0))
    assert abs(frac - float(probs[1])) < 0.05


def test_mixture_shared_covariance_and_scale_mixture():
    locs = jnp.asarray([[-1.0, 0.0], [1.0, 0.5]])
    d = dist.MixtureOfDiagNormalsSharedCovariance(
        locs, jnp.asarray([0.7, 0.9]), jnp.asarray([0.0, 0.0])
    )
    x = jnp.asarray([0.2, 0.1])
    assert np.isfinite(float(d.log_prob(x)))

    gsm = dist.GaussianScaleMixture(
        jnp.asarray([1.0, 2.0]),
        jnp.asarray([0.0, 0.0]),
        jnp.asarray([0.5, 2.0]),
    )
    lp = float(gsm.log_prob(x))
    expected = np.log(
        0.5
        * np.exp(
            scipy.stats.norm.logpdf(
                np.asarray(x), 0, np.array([1.0, 2.0]) * 0.5
            ).sum()
        )
        + 0.5
        * np.exp(
            scipy.stats.norm.logpdf(
                np.asarray(x), 0, np.array([1.0, 2.0]) * 2.0
            ).sum()
        )
    )
    assert abs(lp - expected) < 1e-4


def test_one_hot_straight_through_grad():
    logits = jnp.asarray([0.5, -0.5, 0.0])

    def f(logits):
        d = dist.OneHotCategoricalStraightThrough(logits=logits)
        s = d.rsample(jax.random.key(10))
        return jnp.sum(s * jnp.asarray([1.0, 2.0, 3.0]))

    g = jax.grad(f)(logits)
    assert np.any(np.asarray(g) != 0.0)
    d = dist.OneHotCategoricalStraightThrough(logits=logits)
    s = d.rsample(jax.random.key(11), (100,))
    assert np.allclose(np.asarray(s.sum(-1)), 1.0)


def test_rejector():
    """Half-normal via rejection from Normal using a smooth acceptor is
    hard; instead check the density bookkeeping: accept ~ sigmoid(x)."""
    propose = dist.Normal(0.0, 1.0)

    def log_prob_accept(x):
        return jax.nn.log_sigmoid(3.0 * x)

    # total acceptance = E[sigmoid(3 x)] under N(0,1) = 0.5 by symmetry
    d = dist.Rejector(propose, log_prob_accept, jnp.log(jnp.asarray(0.5)))
    assert abs(_normalization(d, -10.0, 10.0) - 1.0) < 1e-3
    s = d.rsample(jax.random.key(12), (5000,))
    # acceptance tilts samples positive
    assert float(jnp.mean(s)) > 0.3


@pytest.mark.parametrize(
    "alpha,beta", [(1.7, 0.0), (1.3, 0.5), (0.8, -0.3), (1.0, 0.0), (1.02, 0.2)]
)
def test_stable_log_prob_vs_scipy(alpha, beta):
    d = dist.StableWithLogProb(alpha, beta, 1.0, 0.0)
    xs = np.asarray([-3.0, -1.0, -0.2, 0.0, 0.4, 1.5, 4.0])
    # our Stable uses Nolan's S0 parameterization, as does the reference
    scipy.stats.levy_stable.parameterization = "S0"
    expected = scipy.stats.levy_stable.logpdf(xs, alpha, beta)
    actual = np.asarray(d.log_prob(jnp.asarray(xs)))
    # |alpha-1| < 0.2 falls in the f32 interpolation band (~0.05 accuracy)
    atol = 0.06 if abs(alpha - 1) < 0.2 else 0.01
    assert np.allclose(actual, expected, atol=atol), (actual, expected)


@pytest.mark.stage("integration")
def test_stable_log_prob_grad_and_fit():
    """Gradients flow through the quadrature: fit scale by MLE."""
    rng = np.random.RandomState(0)
    data = jnp.asarray(scipy.stats.levy_stable.rvs(1.6, 0.0, scale=2.0, size=500, random_state=rng))

    def nll(log_scale):
        d = dist.StableWithLogProb(1.6, 0.0, jnp.exp(log_scale), 0.0)
        return -jnp.mean(d.log_prob(data))

    g = jax.grad(nll)
    x = jnp.asarray(0.0)
    for _ in range(200):
        x = x - 0.1 * g(x)
    assert abs(float(jnp.exp(x)) - 2.0) < 0.25


def test_conditional_transformed_distribution():
    from pyro_tpu.distributions import (
        ConditionalTransformedDistribution,
        ConditionalTransformModule,
    )
    from pyro_tpu.distributions.transforms import AffineTransform

    class ShiftByContext(ConditionalTransformModule):
        def condition(self, context):
            return AffineTransform(context, jnp.ones_like(context))

    base = dist.Normal(jnp.zeros(2), jnp.ones(2)).to_event(1)
    ctd = ConditionalTransformedDistribution(base, [ShiftByContext()])
    ctx = jnp.asarray([1.0, -2.0])
    d = ctd.condition(ctx)
    s = d.rsample(jax.random.key(13), (2000,))
    assert np.allclose(np.asarray(s.mean(0)), np.asarray(ctx), atol=0.1)
    assert np.isfinite(float(d.log_prob(s[0])))


def test_validation_enabled_context():
    from pyro_tpu.distributions import validation_enabled
    from pyro_tpu.distributions.util import is_validation_enabled

    old = is_validation_enabled()
    with validation_enabled(True):
        assert is_validation_enabled()
    assert is_validation_enabled() == old


def test_torch_distribution_alias():
    assert dist.TorchDistribution is dist.Distribution
    assert issubclass(dist.Normal, dist.TorchDistribution)
