"""Epidemiology tests (mirrors ``tests/contrib/epidemiology``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.epidemiology import (
    SimpleSIRModel,
    binomial_dist,
    infection_dist,
)

pytestmark = pytest.mark.stage("integration")


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
    # simulate an outbreak that actually ignites (pop=500/I0=1 with this
    # seed never takes off, leaving R0 unidentified: data is all 0s/1s)
    rng = np.random.RandomState(0)
    population, tau, R0, rho = 1000, 4.0, 2.0, 0.6
    S, I = population - 5, 5.0
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


def _sim_sir(rng, population, tau, R0, rho, T, I0=5):
    S, I = population - I0, float(I0)
    data = []
    for _ in range(T):
        p = 1 - np.exp(-R0 / tau * I / population)
        s2i = rng.binomial(int(S), p)
        i2r = rng.binomial(int(I), 1 / tau)
        S -= s2i
        I += s2i - i2r
        data.append(rng.binomial(max(s2i, 1), rho))
    return jnp.asarray(data, jnp.float32)


@pytest.mark.parametrize(
    "cls_kwargs",
    [
        ("SimpleSEIRDModel", dict(incubation_time=3.0, recovery_time=4.0, mortality_rate=0.1)),
        ("OverdispersedSIRModel", dict(recovery_time=4.0)),
        ("OverdispersedSEIRModel", dict(incubation_time=3.0, recovery_time=4.0)),
        ("SuperspreadingSIRModel", dict(recovery_time=4.0)),
        ("HeterogeneousSIRModel", dict(recovery_time=4.0)),
    ],
    ids=lambda c: c[0],
)
def test_model_family_smoke(cls_kwargs):
    import pyro_tpu.contrib.epidemiology as epi

    name, kwargs = cls_kwargs
    rng = np.random.RandomState(0)
    data = _sim_sir(rng, 1000, 4.0, 2.5, 0.5, 8)
    model = getattr(epi, name)(1000, data=data, **{
        k: v for k, v in kwargs.items()
    })
    losses = model.fit_svi(num_steps=400, learning_rate=0.05)
    assert losses[-1] < losses[0]
    samples = model.predict(num_samples=10, rng_key=jax.random.key(1))
    assert "R0" in samples
    assert np.isfinite(np.asarray(samples["R0"])).all()


def test_regional_sir_smoke():
    from pyro_tpu.contrib.epidemiology import RegionalSIRModel

    rng = np.random.RandomState(1)
    R = 3
    population = jnp.asarray([500.0, 800.0, 300.0])
    coupling = jnp.asarray(
        [[0.9, 0.05, 0.05], [0.05, 0.9, 0.05], [0.1, 0.1, 0.8]]
    )
    data = jnp.asarray(rng.poisson(5.0, size=(8, R)), jnp.float32)
    model = RegionalSIRModel(population, coupling, 4.0, data)
    losses = model.fit_svi(num_steps=400, learning_rate=0.05)
    assert losses[-1] < losses[0]
    samples = model.predict(num_samples=10, rng_key=jax.random.key(2))
    assert samples["rho"].shape[-1] == R


def test_relaxed_distributions_context():
    from pyro_tpu.contrib.epidemiology import (
        binomial_dist,
        poisson_dist,
        set_relaxed_distributions,
    )

    d = binomial_dist(100.0, 0.3)
    assert isinstance(d, dist.Binomial)
    with set_relaxed_distributions():
        r = binomial_dist(100.0, 0.3)
        assert isinstance(r, dist.Normal)
        # moment matched
        assert np.allclose(float(r.loc), 30.0)
        assert np.allclose(float(r.scale) ** 2, 100 * 0.3 * 0.7, rtol=1e-5)
        p = poisson_dist(9.0)
        assert isinstance(p, dist.Normal)
        assert np.allclose(float(p.loc), 9.0)
    # restored on exit
    assert isinstance(binomial_dist(10.0, 0.5), dist.Binomial)


def test_sparse_and_unknown_start_smoke():
    from pyro_tpu.contrib.epidemiology import (
        SparseSIRModel,
        UnknownStartSIRModel,
    )

    rng = np.random.RandomState(3)
    data = _sim_sir(rng, 1000, 4.0, 2.5, 0.5, 8)
    cum = jnp.cumsum(data)
    mask = jnp.asarray([t % 3 == 2 for t in range(8)])
    m = SparseSIRModel(1000, 4.0, cum, mask)
    losses = m.fit_svi(num_steps=400, learning_rate=0.05)
    assert losses[-1] < losses[0]
    s = m.predict(num_samples=10, rng_key=jax.random.key(5))
    assert "R0" in s

    m2 = UnknownStartSIRModel(1000, 4.0, 4, data)
    losses = m2.fit_svi(num_steps=400, learning_rate=0.05)
    assert losses[-1] < losses[0]
    s2 = m2.predict(num_samples=10, rng_key=jax.random.key(6))
    assert "rho0" in s2 and "rho1" in s2


def test_superspreading_seir_with_phylogeny_smoke():
    from pyro_tpu.contrib.epidemiology import SuperspreadingSEIRModel
    from pyro_tpu.distributions import CoalescentTimes

    rng = np.random.RandomState(4)
    data = _sim_sir(rng, 1000, 4.0, 2.5, 0.5, 8)
    # synthetic phylogeny: 6 leaves within the observation window
    leaf_times = jnp.asarray([7.0, 6.0, 6.5, 5.0, 7.5, 4.0])
    coal_times = jnp.sort(
        CoalescentTimes(leaf_times).sample(jax.random.key(0))
    )
    coal_times = jnp.clip(coal_times, 0.0)
    model = SuperspreadingSEIRModel(
        1000, 3.0, 4.0, data, leaf_times=leaf_times, coal_times=coal_times
    )
    losses = model.fit_svi(num_steps=300, learning_rate=0.05)
    assert losses[-1] < losses[0]
    s = model.predict(num_samples=10, rng_key=jax.random.key(1))
    assert "k" in s and np.isfinite(np.asarray(s["k"])).all()


def test_heterogeneous_regional_smoke():
    from pyro_tpu.contrib.epidemiology import HeterogeneousRegionalSIRModel

    rng = np.random.RandomState(5)
    R = 2
    population = jnp.asarray([600.0, 400.0])
    coupling = jnp.asarray([[0.9, 0.1], [0.1, 0.9]])
    data = jnp.asarray(rng.poisson(4.0, size=(6, R)), jnp.float32)
    model = HeterogeneousRegionalSIRModel(population, coupling, 4.0, data)
    losses = model.fit_svi(num_steps=300, learning_rate=0.05)
    assert losses[-1] < losses[0]
    s = model.predict(num_samples=10, rng_key=jax.random.key(2))
    assert "R0" in s


def test_forecast():
    rng = np.random.RandomState(6)
    data = _sim_sir(rng, 1000, 4.0, 2.5, 0.5, 8)
    model = SimpleSIRModel(1000, 4.0, data)
    model.fit_svi(num_steps=400, learning_rate=0.05)
    s = model.predict(num_samples=10, forecast=4, rng_key=jax.random.key(3))
    # sites past the data exist and are finite
    assert "S2I_11" in s and "obs_11" in s and "I_11" in s
    assert np.isfinite(np.asarray(s["I_11"])).all()


def test_sir_fit_mcmc_quantized_matches_relaxed():
    """The asymptotically exact quantized-enumeration mode
    (ref ``compartmental.py:534`` num_quant_bins>1) agrees with the
    relaxed mode on SimpleSIR synthetic data (VERDICT r1 item 10)."""
    population, tau, T = 200, 4.0, 10
    ext = SimpleSIRModel(population, tau, jnp.zeros(T))
    # prior simulation can die out early; retry seeds until an epidemic
    # of usable size appears
    for seed in range(20):
        sample = ext.generate(
            {"R0": 1.8, "rho": 0.6}, rng_key=jax.random.key(seed)
        )
        obs = jnp.stack([sample[f"obs_{t}"] for t in range(T)])
        if float(obs.sum()) > 3:
            break
    assert float(obs.sum()) > 3

    model_q = SimpleSIRModel(population, tau, obs)
    model_q.fit_mcmc(
        num_quant_bins=4,
        num_samples=150,
        warmup_steps=150,
        heuristic_num_steps=200,
        max_tree_depth=5,
        rng_key=jax.random.key(0),
    )
    r0_q = np.asarray(model_q.samples["R0"]).reshape(-1)

    model_r = SimpleSIRModel(population, tau, obs)
    model_r.fit_mcmc(
        num_samples=150,
        warmup_steps=150,
        max_tree_depth=5,
        rng_key=jax.random.key(1),
    )
    r0_r = np.asarray(model_r.samples["R0"]).reshape(-1)

    # both posteriors should be finite and agree in location
    assert np.isfinite(r0_q).all() and np.isfinite(r0_r).all()
    assert abs(np.median(r0_q) - np.median(r0_r)) < 1.0, (
        np.median(r0_q),
        np.median(r0_r),
    )


def test_quantize_enumerate_mass_preserving():
    """Spline bin probabilities sum to 1 and integer inputs quantize to
    themselves in expectation (ref ``util.py:174-379``)."""
    from pyro_tpu.contrib.epidemiology.util import (
        compute_bin_probs,
        quantize_enumerate,
    )

    s = jnp.linspace(0.0, 1.0, 11)
    for Q in (2, 4, 8):
        probs = compute_bin_probs(s, Q)
        assert probs.shape == (11, Q)
        # the reference's Q=8 quintic spline sums to 841/840 (same
        # coefficients here), so allow a ~1e-3 constant bias
        assert np.allclose(np.asarray(probs.sum(-1)), 1.0, atol=2e-3)
        assert np.all(np.asarray(probs) >= -1e-6)

    x = jnp.array([3.3, 0.1, 7.9])
    vals, logits = quantize_enumerate(x, 0.0, 10.0, num_quant_bins=4)
    assert vals.shape == (3, 4) and logits.shape == (3, 4)
    mean = (vals * jnp.exp(logits)).sum(-1)
    assert np.allclose(np.asarray(mean), np.asarray(x), atol=0.55)


@pytest.mark.stage("integration")
def test_regional_quantized_mcmc_smoke():
    """Regional quantized enumeration (ref ``compartmental.py:1000``
    regional branch): per-region local enumeration, cross-region coupling
    through the auxiliary proxies, region-batched chain reduction."""
    from pyro_tpu.contrib.epidemiology import RegionalSIRModel

    T, R = 8, 2
    population = jnp.asarray([300.0, 200.0])
    coupling = jnp.asarray([[0.9, 0.1], [0.1, 0.9]])
    ext = RegionalSIRModel(population, coupling, 4.0, jnp.zeros((T, R)))
    for seed in range(20):
        s = ext.generate(
            {"R0": 1.8, "rho": jnp.asarray([0.6, 0.6])},
            rng_key=jax.random.key(seed),
        )
        obs = jnp.stack([s[f"obs_{t}"] for t in range(T)])
        if float(obs.sum()) > 3:
            break
    assert float(obs.sum()) > 3
    m = RegionalSIRModel(population, coupling, 4.0, obs)
    m.fit_mcmc(
        num_quant_bins=4,
        num_samples=50,
        warmup_steps=50,
        heuristic_num_steps=50,
        max_tree_depth=4,
        rng_key=jax.random.key(0),
    )
    r0 = np.asarray(m.samples["R0"]).reshape(-1)
    assert np.isfinite(r0).all()
    assert 0.3 < np.median(r0) < 5.0, np.median(r0)


@pytest.mark.stage("integration")
def test_heterogeneous_quantized_smoke():
    """Non-compartmental drift series in transition() are discovered,
    sampled as flat improper-uniform series, and conditioned into the
    vectorized transition (ref ``compartmental.py:828-898``)."""
    from pyro_tpu.contrib.epidemiology import HeterogeneousSIRModel

    T = 8
    ext = HeterogeneousSIRModel(300, 4.0, jnp.zeros(T))
    assert set(ext._non_compartmental) == {"beta"}
    for seed in range(20):
        s = ext.generate({"R0": 2.0}, rng_key=jax.random.key(seed))
        obs = jnp.stack([s[f"obs_{t}"] for t in range(T)])
        if float(obs.sum()) > 3:
            break
    m = HeterogeneousSIRModel(300, 4.0, obs)
    m.fit_mcmc(
        num_quant_bins=4,
        num_samples=20,
        warmup_steps=20,
        heuristic_num_steps=40,
        max_tree_depth=4,
        rng_key=jax.random.key(0),
    )
    r0 = np.asarray(m.samples["R0"]).reshape(-1)
    assert np.isfinite(r0).all()
    assert m.samples["beta"].shape[-1] == T
