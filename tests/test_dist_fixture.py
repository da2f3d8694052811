"""Parameterized distribution case registry with scipy cross-checks.

Native analog of the reference's fixture system
(``/root/reference/tests/distributions/dist_fixture.py:16-161`` and the
~40-entry registry in ``tests/distributions/conftest.py:50-1040``): every
entry pairs one of our distributions with an independent scipy oracle and
a set of concrete examples, and a small number of generic tests sweep the
whole registry:

  * ``log_prob`` (summed over iid data) agrees with scipy's logpdf/logpmf
  * batched parameters give elementwise-correct ``log_prob``
  * sample mean/std agree with scipy's analytic moments
  * discrete supports enumerate exactly

This covers the axis the repo's other sweeps do not: the contract sweep
(``test_distribution_contract.py``) checks shapes/masking/expand, the GOF
sweep checks sampler-vs-density consistency, and the KL sweep checks
analytic pairs — none of them check density *values* against an external
oracle.  The reference uses the same split (dist_fixture's
``get_scipy_logpdf``/``get_scipy_batch_logpdf`` vs its shape tests).
"""

import numpy as np
import pytest
import scipy.stats as sp

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist

# f32 throughout: value agreement is checked to ~1e-4 relative, sampling
# moments to each fixture's `prec` (the reference uses 0.05-0.1).
RTOL = 2e-4
ATOL = 2e-4


class Fixture:
    def __init__(
        self,
        name,
        make,
        scipy_fn,
        examples,
        is_discrete=False,
        prec=0.05,
        sample_check=True,
        num_samples=120_000,
        expected_support=None,
        rtol=RTOL,
        atol=ATOL,
        scipy_data=None,
    ):
        self.name = name
        self.make = make  # params dict -> pyro_tpu distribution
        self.scipy_fn = scipy_fn  # params dict -> frozen scipy dist
        self.examples = examples  # list of {params, test_data[, batched]}
        self.is_discrete = is_discrete
        self.prec = prec
        self.sample_check = sample_check
        self.num_samples = num_samples
        self.expected_support = expected_support
        self.rtol = rtol
        self.atol = atol
        self.scipy_data = scipy_data  # e.g. Dirichlet wants samples as columns

    def __repr__(self):
        return self.name

    def scipy_logprob(self, frozen, data):
        fn = frozen.logpmf if self.is_discrete else frozen.logpdf
        data = np.asarray(data)
        if self.scipy_data is not None:
            data = self.scipy_data(data)
        return fn(data)


def _j(params):
    """Params dict with lists promoted to jnp arrays (f32)."""
    return {
        k: jnp.asarray(v, dtype=jnp.float32)
        if isinstance(v, (list, tuple, float))
        else v
        for k, v in params.items()
    }


FIXTURES = [
    Fixture(
        "Uniform",
        lambda p: dist.Uniform(p["low"], p["high"]),
        lambda p: sp.uniform(
            loc=np.asarray(p["low"]),
            scale=np.asarray(p["high"]) - np.asarray(p["low"]),
        ),
        [
            {"params": {"low": -1.0, "high": 2.5}, "test_data": [0.0, 1.2, 2.0]},
            {
                "params": {"low": [0.0, -2.0], "high": [1.0, 3.0]},
                "test_data": [0.5, 2.0],
                "batched": True,
            },
        ],
    ),
    Fixture(
        "Exponential",
        lambda p: dist.Exponential(p["rate"]),
        lambda p: sp.expon(scale=1.0 / np.asarray(p["rate"])),
        [
            {"params": {"rate": 1.7}, "test_data": [0.1, 0.5, 2.0]},
            {
                "params": {"rate": [0.5, 2.0, 4.0]},
                "test_data": [0.4, 0.9, 0.2],
                "batched": True,
            },
        ],
    ),
    Fixture(
        "Gamma",
        lambda p: dist.Gamma(p["concentration"], p["rate"]),
        lambda p: sp.gamma(
            np.asarray(p["concentration"]), scale=1.0 / np.asarray(p["rate"])
        ),
        [
            {"params": {"concentration": 2.4, "rate": 1.5}, "test_data": [0.5, 1.0, 3.0]},
            {
                "params": {"concentration": [0.7, 3.0], "rate": [1.0, 0.25]},
                "test_data": [0.8, 6.0],
                "batched": True,
            },
        ],
    ),
    Fixture(
        "InverseGamma",
        lambda p: dist.InverseGamma(p["concentration"], p["rate"]),
        lambda p: sp.invgamma(
            np.asarray(p["concentration"]), scale=np.asarray(p["rate"])
        ),
        [{"params": {"concentration": 3.0, "rate": 2.0}, "test_data": [0.5, 1.0, 2.0]}],
    ),
    Fixture(
        "Beta",
        lambda p: dist.Beta(p["concentration1"], p["concentration0"]),
        lambda p: sp.beta(
            np.asarray(p["concentration1"]), np.asarray(p["concentration0"])
        ),
        [
            {
                "params": {"concentration1": 2.0, "concentration0": 3.5},
                "test_data": [0.1, 0.5, 0.9],
            },
            {
                "params": {"concentration1": [0.5, 4.0], "concentration0": [0.5, 1.0]},
                "test_data": [0.3, 0.8],
                "batched": True,
            },
        ],
    ),
    Fixture(
        "AffineBeta",
        lambda p: dist.AffineBeta(
            p["concentration1"], p["concentration0"], p["loc"], p["scale"]
        ),
        lambda p: sp.beta(
            np.asarray(p["concentration1"]),
            np.asarray(p["concentration0"]),
            loc=np.asarray(p["loc"]),
            scale=np.asarray(p["scale"]),
        ),
        [
            {
                "params": {
                    "concentration1": 2.0,
                    "concentration0": 3.0,
                    "loc": -1.0,
                    "scale": 4.0,
                },
                "test_data": [-0.5, 0.0, 2.5],
            }
        ],
        # sample() clamps to the open interval; moments still match
    ),
    Fixture(
        "LogNormal",
        lambda p: dist.LogNormal(p["loc"], p["scale"]),
        lambda p: sp.lognorm(
            s=np.asarray(p["scale"]), scale=np.exp(np.asarray(p["loc"]))
        ),
        [
            {"params": {"loc": 0.3, "scale": 0.8}, "test_data": [0.5, 1.0, 4.0]},
            {
                "params": {"loc": [-1.0, 1.0], "scale": [0.5, 1.5]},
                "test_data": [0.4, 2.0],
                "batched": True,
            },
        ],
    ),
    Fixture(
        "Normal",
        lambda p: dist.Normal(p["loc"], p["scale"]),
        lambda p: sp.norm(np.asarray(p["loc"]), np.asarray(p["scale"])),
        [
            {"params": {"loc": 0.5, "scale": 1.2}, "test_data": [-1.0, 0.0, 2.0]},
            {
                "params": {"loc": [0.0, 3.0, -2.0], "scale": [1.0, 0.5, 2.0]},
                "test_data": [0.3, 2.8, -1.0],
                "batched": True,
            },
        ],
    ),
    Fixture(
        "HalfNormal",
        lambda p: dist.HalfNormal(p["scale"]),
        lambda p: sp.halfnorm(scale=np.asarray(p["scale"])),
        [{"params": {"scale": 1.5}, "test_data": [0.1, 1.0, 3.0]}],
    ),
    Fixture(
        "Cauchy",
        lambda p: dist.Cauchy(p["loc"], p["scale"]),
        lambda p: sp.cauchy(np.asarray(p["loc"]), np.asarray(p["scale"])),
        [{"params": {"loc": 0.5, "scale": 1.2}, "test_data": [-1.0, 0.5, 3.0]}],
        sample_check=False,  # undefined moments
    ),
    Fixture(
        "HalfCauchy",
        lambda p: dist.HalfCauchy(p["scale"]),
        lambda p: sp.halfcauchy(scale=np.asarray(p["scale"])),
        [{"params": {"scale": 0.8}, "test_data": [0.2, 1.0, 5.0]}],
        sample_check=False,
    ),
    Fixture(
        "StudentT",
        lambda p: dist.StudentT(p["df"], p["loc"], p["scale"]),
        lambda p: sp.t(
            np.asarray(p["df"]), np.asarray(p["loc"]), np.asarray(p["scale"])
        ),
        [{"params": {"df": 5.0, "loc": 0.5, "scale": 2.0}, "test_data": [-2.0, 0.5, 4.0]}],
        prec=0.1,
    ),
    Fixture(
        "Laplace",
        lambda p: dist.Laplace(p["loc"], p["scale"]),
        lambda p: sp.laplace(np.asarray(p["loc"]), np.asarray(p["scale"])),
        [{"params": {"loc": -0.5, "scale": 1.5}, "test_data": [-2.0, 0.0, 1.0]}],
    ),
    Fixture(
        "AsymmetricLaplace",
        lambda p: dist.AsymmetricLaplace(p["loc"], p["scale"], p["asymmetry"]),
        lambda p: sp.laplace_asymmetric(
            np.asarray(p["asymmetry"]),
            loc=np.asarray(p["loc"]),
            scale=np.asarray(p["scale"]),
        ),
        [
            {
                "params": {"loc": 0.3, "scale": 1.2, "asymmetry": 1.8},
                "test_data": [-1.0, 0.3, 2.0],
            }
        ],
    ),
    Fixture(
        "Gumbel",
        lambda p: dist.Gumbel(p["loc"], p["scale"]),
        lambda p: sp.gumbel_r(np.asarray(p["loc"]), np.asarray(p["scale"])),
        [{"params": {"loc": 0.0, "scale": 1.3}, "test_data": [-1.0, 0.5, 3.0]}],
    ),
    Fixture(
        "Logistic",
        lambda p: dist.Logistic(p["loc"], p["scale"]),
        lambda p: sp.logistic(np.asarray(p["loc"]), np.asarray(p["scale"])),
        [{"params": {"loc": 0.5, "scale": 0.8}, "test_data": [-1.0, 0.5, 2.0]}],
    ),
    Fixture(
        "Weibull",
        lambda p: dist.Weibull(p["scale"], p["concentration"]),
        lambda p: sp.weibull_min(
            c=np.asarray(p["concentration"]), scale=np.asarray(p["scale"])
        ),
        [{"params": {"scale": 1.5, "concentration": 2.0}, "test_data": [0.3, 1.0, 2.5]}],
    ),
    Fixture(
        "Pareto",
        lambda p: dist.Pareto(p["scale"], p["alpha"]),
        lambda p: sp.pareto(b=np.asarray(p["alpha"]), scale=np.asarray(p["scale"])),
        [{"params": {"scale": 1.0, "alpha": 3.5}, "test_data": [1.1, 2.0, 5.0]}],
        prec=0.15,
    ),
    Fixture(
        "Chi2",
        lambda p: dist.Chi2(p["df"]),
        lambda p: sp.chi2(np.asarray(p["df"])),
        [{"params": {"df": 4.0}, "test_data": [1.0, 3.0, 8.0]}],
    ),
    Fixture(
        "FisherSnedecor",
        lambda p: dist.FisherSnedecor(p["df1"], p["df2"]),
        lambda p: sp.f(np.asarray(p["df1"]), np.asarray(p["df2"])),
        [{"params": {"df1": 5.0, "df2": 9.0}, "test_data": [0.5, 1.0, 3.0]}],
        prec=0.15,
    ),
    Fixture(
        "VonMises",
        lambda p: dist.VonMises(p["loc"], p["concentration"]),
        lambda p: sp.vonmises(
            np.asarray(p["concentration"]), loc=np.asarray(p["loc"])
        ),
        [{"params": {"loc": 0.5, "concentration": 2.0}, "test_data": [-2.0, 0.5, 2.5]}],
        sample_check=False,  # circular mean; checked in test_gof
    ),
    Fixture(
        "MultivariateNormal",
        lambda p: dist.MultivariateNormal(
            jnp.asarray(p["loc"], jnp.float32),
            covariance_matrix=jnp.asarray(p["cov"], jnp.float32),
        ),
        lambda p: sp.multivariate_normal(np.asarray(p["loc"]), np.asarray(p["cov"])),
        [
            {
                "params": {
                    "loc": [0.5, -0.3],
                    "cov": [[1.2, 0.4], [0.4, 0.9]],
                },
                "test_data": [[0.0, 0.0], [1.0, -1.0], [2.0, 1.0]],
            }
        ],
        sample_check=False,
    ),
    Fixture(
        "LowRankMultivariateNormal",
        lambda p: dist.LowRankMultivariateNormal(
            jnp.asarray(p["loc"], jnp.float32),
            jnp.asarray(p["cov_factor"], jnp.float32),
            jnp.asarray(p["cov_diag"], jnp.float32),
        ),
        lambda p: sp.multivariate_normal(
            np.asarray(p["loc"]),
            np.asarray(p["cov_factor"]) @ np.asarray(p["cov_factor"]).T
            + np.diag(np.asarray(p["cov_diag"])),
        ),
        [
            {
                "params": {
                    "loc": [0.0, 1.0, -1.0],
                    "cov_factor": [[1.0], [0.5], [-0.3]],
                    "cov_diag": [0.5, 0.8, 1.1],
                },
                "test_data": [[0.0, 0.0, 0.0], [1.0, 2.0, -2.0]],
            }
        ],
        sample_check=False,
    ),
    Fixture(
        "MultivariateStudentT",
        lambda p: dist.MultivariateStudentT(
            jnp.asarray(p["df"], jnp.float32),
            jnp.asarray(p["loc"], jnp.float32),
            jnp.asarray(p["scale_tril"], jnp.float32),
        ),
        lambda p: sp.multivariate_t(
            np.asarray(p["loc"]),
            np.asarray(p["scale_tril"]) @ np.asarray(p["scale_tril"]).T,
            df=float(np.asarray(p["df"])),
        ),
        [
            {
                "params": {
                    "df": 6.0,
                    "loc": [0.5, -0.5],
                    "scale_tril": [[1.0, 0.0], [0.3, 0.8]],
                },
                "test_data": [[0.0, 0.0], [2.0, -1.0]],
            }
        ],
        sample_check=False,
    ),
    Fixture(
        "Dirichlet",
        lambda p: dist.Dirichlet(jnp.asarray(p["concentration"], jnp.float32)),
        lambda p: sp.dirichlet(np.asarray(p["concentration"])),
        [
            {
                "params": {"concentration": [2.0, 3.0, 5.0]},
                "test_data": [[0.2, 0.3, 0.5], [0.1, 0.1, 0.8]],
            }
        ],
        sample_check=False,
        scipy_data=lambda x: x.T,
    ),
    # ---- discrete ----------------------------------------------------
    Fixture(
        "Bernoulli",
        lambda p: dist.Bernoulli(p["probs"]),
        lambda p: sp.bernoulli(np.asarray(p["probs"])),
        [
            {"params": {"probs": 0.35}, "test_data": [0.0, 1.0, 1.0, 0.0]},
            {
                "params": {"probs": [0.2, 0.9]},
                "test_data": [1.0, 0.0],
                "batched": True,
            },
        ],
        is_discrete=True,
        expected_support=[0.0, 1.0],
    ),
    Fixture(
        "Binomial",
        lambda p: dist.Binomial(p["total_count"], p["probs"]),
        lambda p: sp.binom(p["total_count"], np.asarray(p["probs"])),
        [
            {"params": {"total_count": 10, "probs": 0.4}, "test_data": [0.0, 4.0, 10.0]},
            {
                "params": {"total_count": 6, "probs": [0.1, 0.8]},
                "test_data": [1.0, 5.0],
                "batched": True,
            },
        ],
        is_discrete=True,
    ),
    Fixture(
        "BetaBinomial",
        lambda p: dist.BetaBinomial(
            p["concentration1"], p["concentration0"], p["total_count"]
        ),
        lambda p: sp.betabinom(
            p["total_count"],
            np.asarray(p["concentration1"]),
            np.asarray(p["concentration0"]),
        ),
        [
            {
                "params": {
                    "concentration1": 2.0,
                    "concentration0": 3.0,
                    "total_count": 12,
                },
                "test_data": [0.0, 5.0, 12.0],
            }
        ],
        is_discrete=True,
    ),
    Fixture(
        "Poisson",
        lambda p: dist.Poisson(p["rate"]),
        lambda p: sp.poisson(np.asarray(p["rate"])),
        [
            {"params": {"rate": 3.5}, "test_data": [0.0, 3.0, 9.0]},
            {
                "params": {"rate": [0.5, 8.0]},
                "test_data": [1.0, 6.0],
                "batched": True,
            },
        ],
        is_discrete=True,
    ),
    Fixture(
        # counts failures before the first success, support starts at 0
        # (torch convention) = scipy geom shifted left by one
        "Geometric",
        lambda p: dist.Geometric(p["probs"]),
        lambda p: sp.geom(np.asarray(p["probs"]), loc=-1),
        [{"params": {"probs": 0.3}, "test_data": [0.0, 2.0, 7.0]}],
        is_discrete=True,
    ),
    Fixture(
        # torch convention: #successes before total_count failures,
        # probs = success probability = scipy nbinom with roles swapped
        "NegativeBinomial",
        lambda p: dist.NegativeBinomial(p["total_count"], p["probs"]),
        lambda p: sp.nbinom(p["total_count"], 1.0 - np.asarray(p["probs"])),
        [{"params": {"total_count": 8, "probs": 0.4}, "test_data": [0.0, 5.0, 14.0]}],
        is_discrete=True,
    ),
    Fixture(
        # Gamma(a, b)-Poisson marginal == NB(a, failure_prob=1/(1+b))
        "GammaPoisson",
        lambda p: dist.GammaPoisson(p["concentration"], p["rate"]),
        lambda p: sp.nbinom(
            np.asarray(p["concentration"]),
            np.asarray(p["rate"]) / (1.0 + np.asarray(p["rate"])),
        ),
        [{"params": {"concentration": 2.5, "rate": 0.8}, "test_data": [0.0, 2.0, 8.0]}],
        is_discrete=True,
    ),
    Fixture(
        "Multinomial",
        lambda p: dist.Multinomial(
            p["total_count"], jnp.asarray(p["probs"], jnp.float32)
        ),
        lambda p: sp.multinomial(p["total_count"], np.asarray(p["probs"])),
        [
            {
                "params": {"total_count": 8, "probs": [0.2, 0.3, 0.5]},
                "test_data": [[2.0, 3.0, 3.0], [0.0, 0.0, 8.0]],
            }
        ],
        is_discrete=True,
        sample_check=False,
    ),
    Fixture(
        "OneHotCategorical",
        lambda p: dist.OneHotCategorical(jnp.asarray(p["probs"], jnp.float32)),
        lambda p: sp.multinomial(1, np.asarray(p["probs"])),
        [
            {
                "params": {"probs": [0.1, 0.6, 0.3]},
                "test_data": [[0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
            }
        ],
        is_discrete=True,
        sample_check=False,
        expected_support=np.eye(3),
    ),
]


def _dirichlet_multinomial_fixture():
    if not hasattr(sp, "dirichlet_multinomial"):
        return []
    return [
        Fixture(
            "DirichletMultinomial",
            lambda p: dist.DirichletMultinomial(
                jnp.asarray(p["concentration"], jnp.float32), p["total_count"]
            ),
            lambda p: sp.dirichlet_multinomial(
                np.asarray(p["concentration"]), p["total_count"]
            ),
            [
                {
                    "params": {"concentration": [1.5, 2.5, 3.0], "total_count": 7},
                    "test_data": [[2.0, 2.0, 3.0], [0.0, 7.0, 0.0]],
                }
            ],
            is_discrete=True,
            sample_check=False,
        )
    ]


FIXTURES = FIXTURES + _dirichlet_multinomial_fixture()

IDS = [f.name for f in FIXTURES]


def _examples(pred=lambda ex: True):
    return [
        pytest.param(f, i, id=f"{f.name}-{i}")
        for f in FIXTURES
        for i, ex in enumerate(f.examples)
        if pred(ex)
    ]


@pytest.mark.parametrize("fixture, idx", _examples())
def test_log_prob_matches_scipy(fixture, idx):
    """Summed iid log_prob equals the scipy oracle's (ref
    dist_fixture.get_scipy_logpdf + test_distributions.test_log_pdf)."""
    ex = fixture.examples[idx]
    d = fixture.make(_j(ex["params"]))
    data = np.asarray(ex["test_data"], dtype=np.float32)
    ours = np.asarray(d.log_prob(jnp.asarray(data)))
    frozen = fixture.scipy_fn(ex["params"])
    theirs = fixture.scipy_logprob(frozen, data)
    np.testing.assert_allclose(
        ours.sum(),
        np.sum(theirs),
        rtol=fixture.rtol,
        atol=fixture.atol,
        err_msg=fixture.name,
    )


@pytest.mark.parametrize("fixture, idx", _examples(lambda ex: ex.get("batched")))
def test_batch_log_prob_matches_scipy(fixture, idx):
    """Elementwise log_prob under batched parameters matches scipy
    evaluated per batch element (ref get_scipy_batch_logpdf +
    test_batch_log_pdf)."""
    ex = fixture.examples[idx]
    d = fixture.make(_j(ex["params"]))
    data = np.asarray(ex["test_data"], dtype=np.float32)
    ours = np.asarray(d.log_prob(jnp.asarray(data)))
    assert ours.shape == data.shape
    n = data.shape[0]
    for i in range(n):
        pi = {
            k: (np.asarray(v)[i] if np.ndim(v) >= 1 else v)
            for k, v in ex["params"].items()
        }
        frozen = fixture.scipy_fn(pi)
        expected = fixture.scipy_logprob(frozen, data[i])
        np.testing.assert_allclose(
            ours[i],
            expected,
            rtol=fixture.rtol,
            atol=fixture.atol,
            err_msg=f"{fixture.name}[{i}]",
        )


@pytest.mark.parametrize(
    "fixture",
    [pytest.param(f, id=f.name) for f in FIXTURES if f.sample_check],
)
def test_sample_moments_match_scipy(fixture):
    """Sample mean/std vs scipy's analytic moments (ref
    test_distributions.test_mean_and_variance via Fixture.get_samples)."""
    ex = fixture.examples[0]
    d = fixture.make(_j(ex["params"]))
    frozen = fixture.scipy_fn(ex["params"])
    n = fixture.num_samples
    samples = np.asarray(
        d.sample(jax.random.key(20250819), sample_shape=(n,)), dtype=np.float64
    )
    assert samples.shape[0] == n
    mean, std = frozen.mean(), frozen.std()
    scale = np.maximum(np.abs(std), 1e-2)
    np.testing.assert_allclose(
        samples.mean(axis=0), mean, atol=5 * fixture.prec * scale, rtol=0
    )
    np.testing.assert_allclose(
        samples.std(axis=0), std, atol=5 * fixture.prec * scale, rtol=0
    )


@pytest.mark.parametrize(
    "fixture",
    [
        pytest.param(f, id=f.name)
        for f in FIXTURES
        if f.expected_support is not None
    ],
)
def test_enumerate_support(fixture):
    ex = fixture.examples[0]
    d = fixture.make(_j(ex["params"]))
    support = np.asarray(d.enumerate_support(expand=False))
    np.testing.assert_allclose(
        support.reshape(np.shape(fixture.expected_support)),
        fixture.expected_support,
    )


def test_registry_is_broad():
    """Keep the registry honest: at least 30 fixtures, both kinds."""
    assert len(FIXTURES) >= 30
    assert sum(f.is_discrete for f in FIXTURES) >= 9
    assert sum(not f.is_discrete for f in FIXTURES) >= 20
