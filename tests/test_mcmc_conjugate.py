"""HMC/NUTS posterior-correctness suite against analytic posteriors.

Mirrors the reference's ``tests/infer/mcmc/test_hmc.py`` (GaussianChain
fixtures with closed-form posterior means/precisions) and
``test_nuts.py`` (conjugate models: beta-bernoulli, gamma-normal,
dirichlet-categorical, logistic regression) plus the discrete-latent
models (GMM, bernoulli-latent) that exercise NUTS over an ENUMERATED
potential (discrete sites marginalized out of the energy, ref
``mcmc/util.py:244`` TraceEinsumEvaluator).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer.mcmc import HMC, MCMC, NUTS

pytestmark = pytest.mark.stage("integration")


def _run(kernel, num_samples, warmup, *args, seed=0):
    mcmc = MCMC(
        kernel, num_samples=num_samples, warmup_steps=warmup, num_chains=1
    )
    mcmc.run(*args, rng_key=jax.random.key(seed))
    return {k: np.asarray(v) for k, v in mcmc.get_samples().items()}


class GaussianChain:
    """loc_i ~ N(loc_{i-1}, 1), data ~ N(loc_n, 1): tridiagonal-precision
    Gaussian posterior with closed-form means (ref test_hmc.py:34)."""

    def __init__(self, dim, chain_len, num_obs):
        self.dim = dim
        self.chain_len = chain_len
        self.num_obs = num_obs

    def model(self, data):
        loc = jnp.zeros(self.dim)
        for i in range(1, self.chain_len + 1):
            loc = pyro.sample(f"loc_{i}", dist.Normal(loc, 1.0).to_event(1))
        with pyro.plate("obs_plate", self.num_obs):
            pyro.sample("obs", dist.Normal(loc, 1.0).to_event(1), obs=data)

    @property
    def data(self):
        return jnp.ones((self.num_obs, self.dim))


@pytest.mark.parametrize(
    "fixture,num_samples,warmup,expected_means,tol",
    [
        (GaussianChain(dim=10, chain_len=3, num_obs=1), 800, 400,
         [0.25, 0.50, 0.75], 0.10),
        (GaussianChain(dim=5, chain_len=2, num_obs=100), 1200, 600,
         [0.5, 1.0], 0.08),
    ],
    ids=["dim10-len3-obs1", "dim5-len2-obs100"],
)
def test_nuts_conjugate_gaussian_chain(
    fixture, num_samples, warmup, expected_means, tol
):
    samples = _run(
        NUTS(fixture.model), num_samples, warmup, fixture.data
    )
    for i, expected in enumerate(expected_means):
        latent = samples[f"loc_{i + 1}"]
        np.testing.assert_allclose(
            latent.mean(), expected, atol=tol, err_msg=f"loc_{i + 1}"
        )


def test_hmc_conjugate_gaussian_chain():
    fixture = GaussianChain(dim=10, chain_len=3, num_obs=1)
    samples = _run(
        HMC(fixture.model, step_size=0.5, num_steps=4, adapt_step_size=True),
        1000,
        500,
        fixture.data,
    )
    for i, expected in enumerate([0.25, 0.50, 0.75]):
        np.testing.assert_allclose(
            samples[f"loc_{i + 1}"].mean(), expected, atol=0.1
        )


def test_logistic_regression():
    """(ref test_nuts.py:150)"""
    dim = 3
    data = jax.random.normal(jax.random.key(0), (2000, dim))
    true_coefs = jnp.arange(1.0, dim + 1.0)
    logits = (true_coefs * data).sum(-1)
    labels = (
        jax.random.uniform(jax.random.key(1), (2000,))
        < jax.nn.sigmoid(logits)
    ).astype(jnp.float32)

    def model(data):
        coefs = pyro.sample(
            "beta", dist.Normal(jnp.zeros(dim), jnp.ones(dim)).to_event(1)
        )
        pyro.sample(
            "y",
            dist.Bernoulli(logits=(coefs * data).sum(-1)).to_event(1),
            obs=labels,
        )

    samples = _run(NUTS(model), 500, 300, data)
    rmse = np.sqrt(((samples["beta"].mean(0) - np.asarray(true_coefs)) ** 2).mean())
    # finite-sample MLE deviates from the generating coefficients; the
    # posterior concentrates near the MLE, not the truth
    assert rmse < 0.2, samples["beta"].mean(0)


@pytest.mark.parametrize(
    "step_size,adapt_step_size,adapt_mass_matrix,full_mass",
    [
        (0.1, False, True, False),
        (None, True, False, False),
        (None, True, True, False),
        (None, True, True, True),
    ],
    ids=["fixed-step", "adapt-step", "adapt-both", "full-mass"],
)
def test_beta_bernoulli(step_size, adapt_step_size, adapt_mass_matrix, full_mass):
    """(ref test_nuts.py:184)"""
    true_probs = jnp.asarray([0.9, 0.1])
    data = (
        jax.random.uniform(jax.random.key(0), (1000, 2)) < true_probs
    ).astype(jnp.float32)

    def model(data):
        p_latent = pyro.sample(
            "p_latent", dist.Beta(jnp.asarray([1.1, 1.1]), jnp.asarray([1.1, 1.1])).to_event(1)
        )
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Bernoulli(p_latent).to_event(1), obs=data)

    kw = dict(
        adapt_step_size=adapt_step_size,
        adapt_mass_matrix=adapt_mass_matrix,
        full_mass=full_mass,
    )
    if step_size is not None:
        kw["step_size"] = step_size
    samples = _run(NUTS(model, **kw), 400, 300, data)
    np.testing.assert_allclose(
        samples["p_latent"].mean(0), np.asarray(true_probs), atol=0.03
    )


def test_gamma_normal():
    """(ref test_nuts.py:209)"""
    true_std = jnp.asarray([0.5, 2.0])
    data = 3.0 + true_std * jax.random.normal(jax.random.key(0), (2000, 2))

    def model(data):
        p_latent = pyro.sample(
            "p_latent",
            dist.Gamma(jnp.ones(2), jnp.ones(2)).to_event(1),
        )
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(3.0, p_latent).to_event(1), obs=data)

    samples = _run(NUTS(model), 300, 300, data)
    np.testing.assert_allclose(
        samples["p_latent"].mean(0), np.asarray(true_std), atol=0.07
    )


def test_dirichlet_categorical():
    """(ref test_nuts.py:232)"""
    true_probs = jnp.asarray([0.1, 0.6, 0.3])
    data = jax.random.categorical(
        jax.random.key(0), jnp.log(true_probs), shape=(2000,)
    )

    def model(data):
        p_latent = pyro.sample("p_latent", dist.Dirichlet(jnp.ones(3)))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Categorical(p_latent), obs=data)

    samples = _run(NUTS(model), 300, 300, data)
    np.testing.assert_allclose(
        samples["p_latent"].mean(0), np.asarray(true_probs), atol=0.03
    )


def test_gamma_beta():
    """(ref test_nuts.py:250)"""
    true_alpha, true_beta = 5.0, 1.0
    data = dist.Beta(true_alpha, true_beta).sample(
        jax.random.key(0), (5000,)
    )

    def model(data):
        alpha = pyro.sample("alpha", dist.Gamma(1.0, 1.0))
        beta = pyro.sample("beta", dist.Gamma(1.0, 1.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("x", dist.Beta(alpha, beta), obs=data)

    samples = _run(NUTS(model), 500, 400, data)
    np.testing.assert_allclose(samples["alpha"].mean(), true_alpha, atol=0.6)
    np.testing.assert_allclose(samples["beta"].mean(), true_beta, atol=0.15)


# -- discrete latents marginalized out of the NUTS potential ----------------


def test_bernoulli_latent_model():
    """Discrete y enumerated out of the energy (ref test_nuts.py:307)."""
    N = 500
    y_prob = 0.3
    y = (jax.random.uniform(jax.random.key(0), (N,)) < y_prob).astype(
        jnp.float32
    )
    z = (
        jax.random.uniform(jax.random.key(1), (N,)) < 0.65 * y + 0.1
    ).astype(jnp.float32)
    data = 2.0 * z + jax.random.normal(jax.random.key(2), (N,))

    def model(data):
        y_prob = pyro.sample("y_prob", dist.Beta(1.0, 1.0))
        with pyro.plate("data", data.shape[0]):
            y = pyro.sample("y", dist.Bernoulli(y_prob))
            z = pyro.sample("z", dist.Bernoulli(0.65 * y + 0.1))
            pyro.sample("obs", dist.Normal(2.0 * z, 1.0), obs=data)

    samples = _run(NUTS(model, max_plate_nesting=1), 400, 300, data)
    # discrete sites are marginalized: only continuous sites returned
    assert set(samples) == {"y_prob"}
    np.testing.assert_allclose(samples["y_prob"].mean(), y_prob, atol=0.06)


def test_gaussian_mixture_model():
    """Enumerated cluster assignments (ref test_nuts.py:274)."""
    K, N = 3, 500
    true_means = jnp.asarray([1.0, 5.0, 10.0])
    true_mix = jnp.asarray([0.1, 0.3, 0.6])
    assign = jax.random.categorical(
        jax.random.key(0), jnp.log(true_mix), shape=(N,)
    )
    data = true_means[assign] + jax.random.normal(jax.random.key(1), (N,))

    def gmm(data):
        phi = pyro.sample("phi", dist.Dirichlet(jnp.ones(K)))
        with pyro.plate("num_clusters", K):
            cluster_means = pyro.sample(
                "cluster_means", dist.Normal(jnp.arange(float(K)), 1.0)
            )
        with pyro.plate("data", data.shape[0]):
            a = pyro.sample("assignments", dist.Categorical(phi))
            pyro.sample("obs", dist.Normal(cluster_means[a], 1.0), obs=data)

    samples = _run(NUTS(gmm, max_plate_nesting=1), 300, 300, data)
    assert set(samples) == {"phi", "cluster_means"}
    np.testing.assert_allclose(
        np.sort(samples["phi"].mean(0)), np.sort(np.asarray(true_mix)),
        atol=0.07,
    )
    np.testing.assert_allclose(
        np.sort(samples["cluster_means"].mean(0)),
        np.asarray(true_means),
        atol=0.35,
    )


def test_discrete_without_enumerate_support_raises():
    def model():
        lam = pyro.sample("lam", dist.Gamma(1.0, 1.0))
        pyro.sample("n", dist.Poisson(lam))

    with pytest.raises(NotImplementedError, match="enumerate"):
        MCMC(NUTS(model), num_samples=10, warmup_steps=10).run(
            rng_key=jax.random.key(0)
        )


def test_all_discrete_raises():
    def model():
        pyro.sample("b", dist.Bernoulli(0.4))

    with pytest.raises(ValueError, match="discrete"):
        MCMC(NUTS(model), num_samples=10, warmup_steps=10).run(
            rng_key=jax.random.key(0)
        )


@pytest.mark.parametrize(
    "strategy",
    ["median", "sample", "uniform", "feasible", "value"],
)
def test_init_strategies(strategy):
    """initialize_model accepts the autoguide init_to_* callables
    (ref tests/infer/test_initialization.py + mcmc/util.py:370)."""
    from pyro_tpu.infer.autoguide.initialization import (
        init_to_feasible,
        init_to_median,
        init_to_sample,
        init_to_uniform,
        init_to_value,
    )

    data = 1.0 + 0.5 * jax.random.normal(jax.random.key(0), (50,))

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        scale = pyro.sample("scale", dist.LogNormal(0.0, 1.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(loc, scale), obs=data)

    strat = {
        "median": init_to_median,
        "sample": init_to_sample,
        "uniform": init_to_uniform,
        "feasible": init_to_feasible,
        "value": init_to_value(
            values={"loc": jnp.asarray(1.0), "scale": jnp.asarray(0.5)}
        ),
    }[strategy]
    kernel = NUTS(model, init_strategy=strat)
    samples = _run(kernel, 200, 200, data)
    np.testing.assert_allclose(samples["loc"].mean(), 1.0, atol=0.2)
    np.testing.assert_allclose(samples["scale"].mean(), 0.5, atol=0.2)
