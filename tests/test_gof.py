"""Goodness-of-fit agreement between sample() and log_prob() across the
distribution catalog (mirrors the reference's use of
``distributions/testing/gof.py`` in its test suite)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import zlib

import pyro_tpu.distributions as dist
from pyro_tpu.distributions.testing.gof import auto_goodness_of_fit

pytestmark = pytest.mark.stage("integration")

TEST_FAILURE_RATE = 5e-3  # one in 200 spurious failures per test


CASES = [
    ("Normal", lambda: dist.Normal(0.3, 1.7)),
    ("LogNormal", lambda: dist.LogNormal(-0.5, 0.8)),
    ("Gamma", lambda: dist.Gamma(2.5, 1.3)),
    ("Beta", lambda: dist.Beta(2.0, 3.5)),
    ("Exponential", lambda: dist.Exponential(1.7)),
    ("Cauchy", lambda: dist.Cauchy(0.0, 1.2)),
    ("StudentT", lambda: dist.StudentT(4.0, 0.5, 1.1)),
    ("Laplace", lambda: dist.Laplace(0.2, 0.9)),
    ("Gumbel", lambda: dist.Gumbel(0.1, 1.3)),
    ("Logistic", lambda: dist.Logistic(0.0, 0.7)),
    ("SkewLogistic", lambda: dist.SkewLogistic(0.0, 1.0, 2.0)),
    ("SoftLaplace", lambda: dist.SoftLaplace(0.0, 1.0)),
    (
        "SoftAsymmetricLaplace",
        lambda: dist.SoftAsymmetricLaplace(0.0, 1.0, 1.4, 0.8),
    ),
    ("AsymmetricLaplace", lambda: dist.AsymmetricLaplace(0.0, 1.0, 1.5)),
    ("Weibull", lambda: dist.Weibull(1.2, 2.0)),
    ("Chi2", lambda: dist.Chi2(5.0)),
    ("HalfNormal", lambda: dist.HalfNormal(1.4)),
    ("HalfCauchy", lambda: dist.HalfCauchy(0.8)),
    ("FisherSnedecor", lambda: dist.FisherSnedecor(6.0, 9.0)),
    ("Kumaraswamy", lambda: dist.Kumaraswamy(2.0, 3.0)),
    ("InverseGamma", lambda: dist.InverseGamma(3.0, 2.0)),
    ("VonMises", lambda: dist.VonMises(0.5, 2.0)),
    ("ContinuousBernoulli", lambda: dist.ContinuousBernoulli(0.3)),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_univariate_gof(name, make):
    d = make()
    samples = d.sample(jax.random.key(zlib.crc32(name.encode()) % 2**31), (20000,))
    probs = np.exp(np.asarray(d.log_prob(samples)))
    gof = auto_goodness_of_fit(np.asarray(samples), probs)
    assert gof > TEST_FAILURE_RATE, (name, gof)


MULTIVARIATE_CASES = [
    (
        "MultivariateNormal",
        lambda: dist.MultivariateNormal(
            jnp.asarray([0.5, -0.3]),
            covariance_matrix=jnp.asarray([[1.5, 0.4], [0.4, 0.8]]),
        ),
    ),
    (
        "Dirichlet3",
        lambda: dist.Dirichlet(jnp.asarray([2.0, 3.0, 1.5])),
    ),
    (
        "MultivariateStudentT",
        lambda: dist.MultivariateStudentT(
            5.0,
            jnp.asarray([0.0, 0.2]),
            jnp.asarray([[1.0, 0.0], [0.3, 0.9]]),
        ),
    ),
]


@pytest.mark.parametrize(
    "name,make", MULTIVARIATE_CASES, ids=[c[0] for c in MULTIVARIATE_CASES]
)
def test_multivariate_gof(name, make):
    d = make()
    n = 4000 * 2 + 1000  # > 1000 * dim
    # fixed seeds: the NN-distance GOF p-value is itself noisy at this n
    samples = d.sample(jax.random.key(len(name)), (n,))
    probs = np.exp(np.asarray(d.log_prob(samples)))
    if name.startswith("Dirichlet"):
        # density lives on the 2-simplex: drop the dependent coordinate
        samples = samples[..., :2]
        gof = auto_goodness_of_fit(
            np.asarray(samples), probs, dim=2
        )
    else:
        gof = auto_goodness_of_fit(np.asarray(samples), probs)
    assert gof > 1e-3, (name, gof)


def test_gof_detects_wrong_density():
    """Negative control: a mismatched density must fail decisively."""
    d = dist.Normal(0.0, 1.0)
    samples = d.sample(jax.random.key(0), (20000,))
    wrong = np.exp(np.asarray(dist.Normal(0.0, 2.0).log_prob(samples)))
    gof = auto_goodness_of_fit(np.asarray(samples), wrong)
    assert gof < 1e-6, gof


# -- discrete catalog: exact multinomial chi-square frequency tests ----------

DISCRETE_CASES = [
    ("Bernoulli", lambda: dist.Bernoulli(0.3), 2),
    ("Categorical", lambda: dist.Categorical(jnp.asarray([0.2, 0.5, 0.3])), 3),
    ("Binomial", lambda: dist.Binomial(8, 0.4), 9),
    ("Poisson", lambda: dist.Poisson(2.5), 12),
    ("Geometric", lambda: dist.Geometric(0.45), 10),
    ("NegativeBinomial", lambda: dist.NegativeBinomial(4.0, probs=0.35), 10),
    ("BetaBinomial", lambda: dist.BetaBinomial(2.0, 3.0, 8), 9),
    ("GammaPoisson", lambda: dist.GammaPoisson(3.0, 1.2), 10),
    (
        "DirichletMultinomial1",
        lambda: dist.DirichletMultinomial(jnp.asarray([1.5, 2.5, 1.0]), 1),
        3,
    ),
    ("ZeroInflatedPoisson", lambda: dist.ZeroInflatedPoisson(3.0, gate=0.3), 10),
    (
        "OrderedLogistic",
        lambda: dist.OrderedLogistic(
            0.4, jnp.asarray([-1.0, 0.5, 2.0])
        ),
        4,
    ),
]


@pytest.mark.parametrize(
    "name,make,support", DISCRETE_CASES, ids=[c[0] for c in DISCRETE_CASES]
)
def test_discrete_gof(name, make, support):
    from pyro_tpu.distributions.testing.gof import multinomial_goodness_of_fit

    d = make()
    n = 20000
    samples = np.asarray(
        jax.device_get(d.sample(jax.random.key(zlib.crc32(name.encode()) % 2**31), (n,)))
    )
    if samples.ndim == 2:  # one-hot (DirichletMultinomial with n=1)
        samples = samples.argmax(-1)
    values = jnp.arange(support, dtype=jnp.result_type(samples.dtype, jnp.float32))
    if name == "DirichletMultinomial1":
        probs = np.asarray(
            [
                float(
                    jnp.exp(
                        d.log_prob(
                            jax.nn.one_hot(v, support)
                        )
                    )
                )
                for v in range(support)
            ]
        )
    else:
        probs = np.exp(np.asarray(d.log_prob(values)))
    counts = np.bincount(
        np.clip(samples.astype(np.int64), 0, support - 1), minlength=support
    )
    # fold the tail mass into the last bin for unbounded supports
    probs[-1] += max(0.0, 1.0 - probs.sum())
    gof = multinomial_goodness_of_fit(probs, counts, total_count=n)
    assert gof > TEST_FAILURE_RATE, (name, gof)


# -- additional catalog coverage ---------------------------------------------

EXTRA_CASES = [
    ("Stable", lambda: dist.StableWithLogProb(1.7, 0.5, 1.0, 0.0)),
    (
        "FoldedNormal",
        lambda: dist.FoldedDistribution(dist.Normal(0.5, 1.2)),
    ),
    (
        "TransformedExp",
        lambda: dist.TransformedDistribution(
            dist.Normal(0.0, 1.0), [dist.transforms.ExpTransform()]
        ),
    ),
    (
        "MixtureSameFamily",
        lambda: dist.MixtureSameFamily(
            dist.Categorical(jnp.asarray([0.4, 0.6])),
            dist.Normal(jnp.asarray([-2.0, 2.0]), jnp.asarray([0.7, 1.1])),
        ),
    ),
    (
        "GammaPoissonContinuousTest",
        lambda: dist.LogNormal(0.2, 0.4),
    ),
]


@pytest.mark.parametrize(
    "name,make", EXTRA_CASES, ids=[c[0] for c in EXTRA_CASES]
)
def test_extra_gof(name, make):
    d = make()
    samples = d.sample(jax.random.key(zlib.crc32(name.encode()) % 2**31), (20000,))
    probs = np.exp(np.asarray(d.log_prob(samples)))
    gof = auto_goodness_of_fit(np.asarray(samples), probs)
    assert gof > TEST_FAILURE_RATE, (name, gof)


# -- directional catalog tail: densities on circles, spheres, tori -----------
#
# Each case maps samples to coordinates in which the reference measure is
# Lebesgue (angle on the circle; cylindrical equal-area (z, azimuth) on the
# 2-sphere; the flat torus for bivariate angles), so exp(log_prob) is the
# density w.r.t. those coordinates and the generic GOF applies (mirrors the
# reference's tests/distributions/test_projected_normal.py and
# test_sine_bivariate_von_mises.py sampler checks).

def _sphere_coords(xyz):
    """Area-preserving coordinates on S^2: (z, azimuth)."""
    z = xyz[..., 2]
    phi = np.arctan2(xyz[..., 1], xyz[..., 0])
    return np.stack([z, phi], -1)


DIRECTIONAL_CASES = [
    (
        "ProjectedNormal2",
        lambda: dist.ProjectedNormal(jnp.asarray([1.5, 0.5])),
        lambda x: np.arctan2(x[..., 1], x[..., 0])[..., None],
    ),
    (
        "ProjectedNormal3",
        lambda: dist.ProjectedNormal(jnp.asarray([1.0, 0.5, -0.5])),
        _sphere_coords,
    ),
    (
        "VonMises3D",
        lambda: dist.VonMises3D(jnp.asarray([0.5, 0.0, 1.5])),
        _sphere_coords,
    ),
    (
        "SineBivariateVonMises",
        lambda: dist.SineBivariateVonMises(
            0.5, -0.5, 2.0, 3.0, correlation=0.8
        ),
        lambda x: x,
    ),
    (
        "SineSkewedVonMises",
        lambda: dist.SineSkewed(
            dist.VonMises(jnp.asarray([0.2]), jnp.asarray([1.5])).to_event(1),
            jnp.asarray([0.4]),
        ),
        lambda x: x,
    ),
    (
        "TruncatedPolyaGamma",
        lambda: dist.TruncatedPolyaGamma(()),
        lambda x: x[..., None],
    ),
]


@pytest.mark.parametrize(
    "name,make,coords", DIRECTIONAL_CASES, ids=[c[0] for c in DIRECTIONAL_CASES]
)
def test_directional_gof(name, make, coords):
    d = make()
    n = 20000
    samples = d.sample(
        jax.random.key(zlib.crc32(name.encode()) % 2**31), (n,)
    )
    probs = np.exp(np.asarray(d.log_prob(samples)))
    x = coords(np.asarray(samples))
    dim = x.shape[-1]
    if dim == 1:
        x = x[..., 0]
    gof = auto_goodness_of_fit(x, probs, dim=dim)
    assert gof > 1e-3, (name, gof)


# -- combinatorial catalog tail: exact chi-square over enumerated support ----

def _canonical(x):
    return tuple(np.asarray(x).astype(np.int64).reshape(-1).tolist())


COMBINATORIAL_CASES = [
    (
        "SpanningTree4",
        lambda: dist.SpanningTree(
            jnp.asarray([0.0, 0.5, -0.5, 0.3, -0.2, 0.8])
        ),
    ),
    (
        "OneOneMatching3",
        lambda: dist.OneOneMatching(
            jnp.asarray([[0.0, 0.5, -0.5], [0.2, 0.0, 0.4], [-0.3, 0.1, 0.0]])
        ),
    ),
    (
        "OneTwoMatching",
        lambda: dist.OneTwoMatching(
            jnp.asarray([[0.0, 0.5], [0.2, -0.1], [-0.3, 0.1], [0.4, 0.0]])
        ),
    ),
]


@pytest.mark.parametrize(
    "name,make", COMBINATORIAL_CASES, ids=[c[0] for c in COMBINATORIAL_CASES]
)
def test_combinatorial_gof(name, make):
    """The sampler's empirical frequencies over the full enumerated support
    match exp(log_prob) by multinomial chi-square (mirrors the reference's
    tests/distributions/test_spanning_tree.py::test_sample_gof)."""
    from pyro_tpu.distributions.testing.gof import multinomial_goodness_of_fit

    d = make()
    support = d.enumerate_support(expand=False)
    probs = np.exp(np.asarray(d.log_prob(support)))
    assert abs(probs.sum() - 1.0) < 1e-3, (name, probs.sum())
    index = {_canonical(s): i for i, s in enumerate(np.asarray(support))}
    n = 2000
    keys = jax.random.split(jax.random.key(zlib.crc32(name.encode()) % 2**31), n)
    try:
        samples = jax.vmap(lambda k: d.sample(k))(keys)
    except jax.errors.ConcretizationTypeError:
        # host-side sampler (SpanningTree's C++ backend): loop instead
        samples = jnp.stack([d.sample(k) for k in keys])
    counts = np.zeros(len(index), dtype=np.int64)
    for s in np.asarray(samples):
        counts[index[_canonical(s)]] += 1
    gof = multinomial_goodness_of_fit(
        probs / probs.sum(), counts, total_count=n
    )
    assert gof > TEST_FAILURE_RATE, (name, gof)
