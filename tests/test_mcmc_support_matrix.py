"""Per-kernel breadth suite: HMC and NUTS across the constrained-support
matrix, checking posterior moments against analytic values.

Mirrors the reference's per-kernel fixture sweeps
(``tests/infer/mcmc/test_hmc.py:60-210`` and ``test_nuts.py:60-260``,
where every fixture runs under each kernel with rtol'd mean checks):
each latent support type exercises a different constraint transform in
the potential (positive -> Exp, interval -> sigmoid-affine, simplex ->
stick-breaking, correlation-cholesky -> the LKJ bijection), so a wrong
Jacobian shows up as a biased posterior, not an exception.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer.mcmc import HMC, MCMC, NUTS

pytestmark = pytest.mark.stage("integration")

KERNELS = [NUTS, HMC]


def _kernel(cls, model):
    if cls is HMC:
        # a fixed modest trajectory keeps HMC competitive on these targets
        return HMC(model, step_size=0.1, num_steps=15)
    return NUTS(model)


def _run(cls, model, *args, num_samples=600, warmup=600, seed=0):
    mcmc = MCMC(
        _kernel(cls, model),
        num_samples=num_samples,
        warmup_steps=warmup,
        num_chains=1,
    )
    mcmc.run(*args, rng_key=jax.random.key(seed))
    return {k: np.asarray(v) for k, v in mcmc.get_samples().items()}


# -- positive support: gamma-poisson conjugacy --------------------------------


@pytest.mark.parametrize("cls", KERNELS)
def test_positive_support_gamma_poisson(cls):
    data = jnp.array([3.0, 5.0, 2.0, 4.0, 6.0, 3.0, 4.0, 5.0])
    alpha0, beta0 = 2.0, 1.0

    def model(data):
        rate = pyro.sample("rate", dist.Gamma(alpha0, beta0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Poisson(rate), obs=data)

    post_alpha = alpha0 + float(data.sum())
    post_beta = beta0 + data.shape[0]
    samples = _run(cls, model, data)["rate"]
    assert np.all(samples > 0)
    np.testing.assert_allclose(
        samples.mean(), post_alpha / post_beta, rtol=0.07
    )


# -- interval support: scaled-beta latent --------------------------------------


@pytest.mark.parametrize("cls", KERNELS)
def test_interval_support_uniform_binomial(cls):
    # p ~ Uniform(0.2, 0.8); k ~ Binomial(n, p): posterior is a
    # truncated Beta; with n=40, k=12 the untruncated Beta(13, 29) mass
    # is essentially inside (0.2, 0.8), so its mean is the target
    n_trials, k_succ = 40, 12.0

    def model():
        p = pyro.sample("p", dist.Uniform(0.2, 0.8))
        pyro.sample(
            "obs",
            dist.Binomial(total_count=n_trials, probs=p),
            obs=jnp.asarray(k_succ),
        )

    samples = _run(cls, model)["p"]
    assert np.all((samples > 0.2) & (samples < 0.8))
    np.testing.assert_allclose(samples.mean(), 13.0 / 42.0, rtol=0.07)


# -- simplex support: dirichlet-multinomial conjugacy ---------------------------


@pytest.mark.parametrize("cls", KERNELS)
def test_simplex_support_dirichlet_multinomial(cls):
    counts = jnp.array([14.0, 6.0, 10.0])
    conc = jnp.ones(3) * 2.0

    def model(counts):
        p = pyro.sample("p", dist.Dirichlet(conc))
        pyro.sample(
            "obs",
            dist.Multinomial(total_count=30, probs=p),
            obs=counts,
        )

    samples = _run(cls, model, counts)["p"]
    np.testing.assert_allclose(samples.sum(-1), 1.0, atol=1e-5)
    expected = np.asarray(conc + counts) / float((conc + counts).sum())
    np.testing.assert_allclose(samples.mean(0), expected, rtol=0.1)


# -- correlation-cholesky support: LKJ prior recovers its own mean -------------


@pytest.mark.parametrize("cls", KERNELS)
def test_corr_cholesky_support_lkj(cls):
    # With concentration 1 the LKJ prior over 3x3 correlations is
    # uniform: every off-diagonal correlation has mean 0.  Sampling the
    # PRIOR through MCMC exercises the corr-cholesky bijector + Jacobian.
    def model():
        L = pyro.sample("L", dist.LKJCholesky(3, concentration=1.0))
        pyro.deterministic("corr", L @ jnp.swapaxes(L, -1, -2))

    samples = _run(cls, model, num_samples=800, warmup=600)
    corr = samples["corr"]
    # valid correlation matrices: unit diagonal, symmetric psd
    np.testing.assert_allclose(
        corr[:, np.arange(3), np.arange(3)], 1.0, atol=1e-5
    )
    off = corr[:, np.triu_indices(3, 1)[0], np.triu_indices(3, 1)[1]]
    assert np.abs(off.mean(0)).max() < 0.12


# -- multivariate + event dims: MVN with known posterior ------------------------


@pytest.mark.parametrize("cls", KERNELS)
def test_mvn_event_dims(cls):
    # x ~ N(mu, I), one obs per dim batch: posterior mu | x has mean x/2
    x_obs = jnp.array([1.0, -2.0, 0.5])

    def model(x_obs):
        mu = pyro.sample(
            "mu",
            dist.MultivariateNormal(jnp.zeros(3), jnp.eye(3)),
        )
        pyro.sample(
            "obs",
            dist.MultivariateNormal(mu, jnp.eye(3)),
            obs=x_obs,
        )

    samples = _run(cls, model, x_obs)["mu"]
    np.testing.assert_allclose(
        samples.mean(0), np.asarray(x_obs) / 2.0, atol=0.12
    )


# -- mixed supports in one model ------------------------------------------------


@pytest.mark.parametrize("cls", KERNELS)
def test_mixed_supports_one_model(cls):
    # location (real), scale (positive), weight (unit interval) jointly:
    # transforms must compose independently per site
    y = jnp.array([0.8, 1.2, 1.0, 0.9, 1.1, 1.05, 0.95, 1.0])

    def model(y):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        scale = pyro.sample("scale", dist.LogNormal(0.0, 1.0))
        w = pyro.sample("w", dist.Beta(2.0, 2.0))
        with pyro.plate("data", y.shape[0]):
            pyro.sample("obs", dist.Normal(loc * w, scale), obs=y)

    samples = _run(cls, model, y, num_samples=800, warmup=800)
    assert np.all(samples["scale"] > 0)
    assert np.all((samples["w"] > 0) & (samples["w"] < 1))
    # loc * w should recover the sample mean of y
    lw = samples["loc"] * samples["w"]
    np.testing.assert_allclose(lw.mean(), float(y.mean()), rtol=0.1)


# -- full (dense) mass matrix across a correlated target ------------------------


@pytest.mark.parametrize("cls", KERNELS)
def test_full_mass_correlated_gaussian(cls):
    # strongly correlated 2d Gaussian: dense mass adaptation must learn
    # the covariance well enough to mix (ESS sanity + moment check)
    cov = jnp.array([[1.0, 0.95], [0.95, 1.0]])

    def model():
        pyro.sample(
            "x", dist.MultivariateNormal(jnp.zeros(2), cov)
        )

    if cls is HMC:
        kernel = HMC(model, step_size=0.1, num_steps=15, full_mass=True)
    else:
        kernel = NUTS(model, full_mass=True)
    mcmc = MCMC(kernel, num_samples=1000, warmup_steps=1000, num_chains=1)
    mcmc.run(rng_key=jax.random.key(3))
    x = np.asarray(mcmc.get_samples()["x"])
    np.testing.assert_allclose(x.mean(0), 0.0, atol=0.15)
    emp_cov = np.cov(x.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.2)


# -- deterministic sites are recorded --------------------------------------------


@pytest.mark.parametrize("cls", KERNELS)
def test_deterministic_site_recorded(cls):
    def model():
        z = pyro.sample("z", dist.Normal(0.0, 1.0))
        pyro.deterministic("z2", z**2)

    samples = _run(cls, model, num_samples=400, warmup=400)
    assert "z2" in samples
    np.testing.assert_allclose(
        samples["z2"], samples["z"] ** 2, rtol=1e-5
    )
