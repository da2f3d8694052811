"""Epidemiology tests (mirrors ``tests/contrib/epidemiology``)."""

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.epidemiology import (
    SimpleSIRModel,
    binomial_dist,
    infection_dist,
)


def test_binomial_dist_overdispersion():
    d0 = binomial_dist(100.0, 0.3)
    assert isinstance(d0, dist.Binomial)
    d1 = binomial_dist(100.0, 0.3, overdispersion=0.5)
    assert isinstance(d1, dist.BetaBinomial)
    assert float(d1.variance) > float(d0.variance)
    assert np.allclose(float(d1.mean), 30.0, rtol=1e-5)


def test_infection_dist_moments():
    d = infection_dist(
        individual_rate=2.0,
        num_infectious=10.0,
        num_susceptible=500.0,
        population=1000.0,
    )
    # small-rate limit: mean ~ S * R * I / N
    assert abs(float(d.mean) - 500 * (1 - np.exp(-0.02))) < 1e-3
    ds = infection_dist(
        individual_rate=2.0,
        num_infectious=10.0,
        num_susceptible=500.0,
        population=1000.0,
        concentration=0.5,
    )
    assert np.isfinite(float(ds.log_prob(jnp.array(5.0))))


def test_simple_sir_fit_and_predict():
    # simulate a small outbreak
    rng = np.random.RandomState(0)
    population, tau, R0, rho = 500, 4.0, 2.0, 0.6
    S, I = population - 1, 1.0
    data = []
    for t in range(20):
        p = 1 - np.exp(-R0 / tau * I / population)
        s2i = rng.binomial(int(S), p)
        i2r = rng.binomial(int(I), 1 / tau)
        S -= s2i
        I += s2i - i2r
        data.append(rng.binomial(max(s2i, 1), rho))
    model = SimpleSIRModel(population, tau, jnp.asarray(data, jnp.float32))
    losses = model.fit_svi(num_steps=4000, learning_rate=0.05)
    assert losses[-1] < losses[0]
    samples = model.predict(num_samples=50, rng_key=jax.random.key(1))
    R0_est = float(np.median(np.asarray(samples["R0"])))
    assert 0.8 < R0_est < 4.5, R0_est
    assert "rho" in samples


def test_simple_seir_smoke():
    """SEIR relaxed-flow model trains and predicts (light smoke; full
    recovery is covered by the SIR test)."""
    rng = np.random.RandomState(2)
    population, tau_e, tau_i, R0, rho = 1000, 3.0, 4.0, 2.5, 0.5
    S, E, I = population - 5, 0.0, 5.0
    data = []
    for t in range(10):
        p = 1 - np.exp(-R0 / tau_i * I / population)
        s2e = rng.binomial(int(S), p)
        e2i = rng.binomial(int(E), 1 / tau_e)
        i2r = rng.binomial(int(I), 1 / tau_i)
        S -= s2e
        E += s2e - e2i
        I += e2i - i2r
        data.append(rng.binomial(max(s2e, 1), rho))
    from pyro_tpu.contrib.epidemiology import SimpleSEIRModel

    model = SimpleSEIRModel(
        population, tau_e, tau_i, jnp.asarray(data, jnp.float32)
    )
    losses = model.fit_svi(num_steps=600, learning_rate=0.05)
    assert losses[-1] < losses[0]
    samples = model.predict(num_samples=20, rng_key=jax.random.key(4))
    assert "R0" in samples and "rho" in samples
    assert np.isfinite(np.asarray(samples["R0"])).all()


def test_sir_fit_mcmc():
    """NUTS over the relaxed flows recovers R0 (ref fit_mcmc:534)."""
    rng = np.random.RandomState(1)
    population, tau, R0, rho = 1000, 4.0, 2.5, 0.5
    S, I = population - 5, 5.0
    data = []
    for t in range(10):
        p = 1 - np.exp(-R0 / tau * I / population)
        s2i = rng.binomial(int(S), p)
        i2r = rng.binomial(int(I), 1 / tau)
        S -= s2i
        I += s2i - i2r
        data.append(rng.binomial(max(s2i, 1), rho))
    model = SimpleSIRModel(population, tau, jnp.asarray(data, jnp.float32))
    model.fit_mcmc(
        num_samples=200, warmup_steps=200, rng_key=jax.random.key(0)
    )
    R0_est = float(np.median(np.asarray(model.samples["R0"])))
    assert 0.8 < R0_est < 5.0, R0_est
    pred = model.predict(num_samples=20, rng_key=jax.random.key(1))
    assert "R0" in pred
