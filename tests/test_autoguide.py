"""Autoguide tests (mirrors ``tests/infer/autoguide/test_autoguide.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import (
    SVI,
    AutoDelta,
    AutoDiagonalNormal,
    AutoGuideList,
    AutoLowRankMultivariateNormal,
    AutoMultivariateNormal,
    AutoNormal,
    Predictive,
    Trace_ELBO,
)
from pyro_tpu.infer.autoguide import init_to_feasible, init_to_median
from pyro_tpu.optim import Adam

DATA = jnp.array([1.0, 2.0, 3.0])
POST_VAR = 1.0 / (1.0 / 100.0 + 3.0)
POST_LOC = POST_VAR * 6.0


def conj_model(data):
    loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
    with pyro.plate("data", data.shape[0]):
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)


@pytest.mark.parametrize(
    "guide_cls",
    [
        AutoNormal,
        AutoDiagonalNormal,
        AutoMultivariateNormal,
        AutoLowRankMultivariateNormal,
    ],
)
def test_autoguide_conjugate_gaussian(guide_cls):
    guide = guide_cls(conj_model)
    svi = SVI(conj_model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
    for _ in range(2000):
        svi.step(DATA)
    median = guide.median()
    assert np.allclose(np.asarray(median["loc"]), POST_LOC, atol=0.15)


def test_autodelta_map():
    guide = AutoDelta(conj_model)
    svi = SVI(conj_model, guide, Adam({"lr": 0.05}), Trace_ELBO())
    for _ in range(1500):
        svi.step(DATA)
    median = guide.median()
    assert np.allclose(np.asarray(median["loc"]), POST_LOC, atol=0.1)


def test_autoguide_constrained_site():
    """Positive-constrained latent handled via biject_to."""

    def model(data):
        scale = pyro.sample("scale", dist.LogNormal(0.0, 1.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(0.0, scale), obs=data)

    for guide_cls in (AutoNormal, AutoDiagonalNormal):
        pyro.clear_param_store()
        guide = guide_cls(model)
        svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
        for _ in range(1000):
            svi.step(DATA)
        med = guide.median()
        assert np.asarray(med["scale"]) > 0


def test_autonormal_plate_subsampling():
    """Per-datapoint latents with subsampling: params stay full size."""
    N, S = 20, 5
    data = jnp.linspace(-1, 1, N)

    def model(data, ind=None):
        with pyro.plate("data", N, subsample_size=S) as idx:
            z = pyro.sample("z", dist.Normal(0.0, 1.0))
            pyro.sample("obs", dist.Normal(z, 0.5), obs=data[idx])

    guide = AutoNormal(model)
    svi = SVI(model, guide, Adam({"lr": 0.1}), Trace_ELBO(num_particles=4))
    for _ in range(800):
        svi.step(data)
    store = pyro.get_param_store()
    locs = np.asarray(store["AutoNormal.locs.z"])
    assert locs.shape == (N,)
    # each local mean should shrink toward its datapoint
    corr = np.corrcoef(locs, np.asarray(data))[0, 1]
    assert corr > 0.9


def test_autoguide_quantiles():
    guide = AutoNormal(conj_model)
    svi = SVI(conj_model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
    for _ in range(1500):
        svi.step(DATA)
    q = guide.quantiles([0.1, 0.5, 0.9])
    assert np.asarray(q["loc"][0]) < np.asarray(q["loc"][1]) < np.asarray(q["loc"][2])
    assert np.allclose(np.asarray(q["loc"][1]), POST_LOC, atol=0.2)


def test_autoguidelist():
    def model(data):
        a = pyro.sample("a", dist.Normal(0.0, 10.0))
        b = pyro.sample("b", dist.Normal(0.0, 10.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(a + b, 1.0), obs=data)

    from pyro_tpu import poutine

    guide = AutoGuideList(model)
    guide.append(AutoNormal(poutine.block(model, expose=["a"])))
    guide.append(AutoDelta(poutine.block(model, expose=["b"])))
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=4))
    for _ in range(500):
        svi.step(DATA)
    med = guide.median()
    assert set(med) == {"a", "b"}


def test_predictive_with_guide():
    def model(data, obs=None):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=obs)

    guide = AutoNormal(lambda data, obs=None: model(data, obs))
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
    for _ in range(1500):
        svi.step(DATA, DATA)
    pred = Predictive(model, guide=guide, num_samples=1000)
    samples = pred(DATA, rng_key=jax.random.key(3))
    assert samples["loc"].shape == (1000,)
    assert np.abs(np.asarray(samples["loc"]).mean() - POST_LOC) < 0.2
    # observed site resampled as posterior predictive
    assert samples["obs"].shape == (1000, 3)
    assert np.abs(np.asarray(samples["obs"]).mean() - POST_LOC) < 0.25


def test_predictive_from_mcmc_samples():
    from pyro_tpu.infer import MCMC, NUTS

    mcmc = MCMC(NUTS(conj_model), num_samples=300, warmup_steps=300, num_chains=1)
    mcmc.run(DATA, rng_key=jax.random.key(0))
    post = mcmc.get_samples()
    pred = Predictive(conj_model, posterior_samples=post, return_sites=["obs"])
    out = pred(DATA, rng_key=jax.random.key(5))
    assert out["obs"].shape == (300, 3)
    assert np.abs(np.asarray(out["obs"]).mean() - 2.0) < 0.3


def test_autostructured_captures_correlation():
    """Two latents observed only through their sum: the structured guide
    should learn the dependency and beat mean-field ELBO."""
    from pyro_tpu.infer.autoguide import AutoStructured

    data = jnp.array([1.0])

    def model(data):
        a = pyro.sample("a", dist.Normal(0.0, 1.0))
        b = pyro.sample("b", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(a + b, 0.3), obs=data)

    guide = AutoStructured(model)
    svi = SVI(model, guide, Adam({"lr": 0.02}), Trace_ELBO(num_particles=16))
    losses = [svi.step(data) for _ in range(2500)]
    store = pyro.get_param_store()
    # dependency weight learned nonzero (posterior corr is strongly negative)
    key = [k for k in store.keys() if ".deps." in k]
    assert key, "no dependency params created"
    W = np.asarray(store[key[0]])
    assert abs(W).max() > 0.05, W
    # posterior of a+b should center near 1
    med = guide.median()
    assert abs(float(med["a"] + med["b"]) - 0.93) < 0.35


def test_autogaussian_runs():
    from pyro_tpu.infer.autoguide import AutoGaussian

    guide = AutoGaussian(conj_model)
    svi = SVI(conj_model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
    for _ in range(1000):
        svi.step(DATA)
    med = guide.median()
    assert np.allclose(np.asarray(med["loc"]), POST_LOC, atol=0.25)


@pytest.mark.parametrize("Guide", [None])
def test_plated_site_before_unplated_site(Guide):
    """Regression: a plated site sampled BEFORE an unplated one must not
    drag the later site into its plate (per-site plate stacks,
    ref guides.py:319/415)."""
    from pyro_tpu import poutine
    from pyro_tpu.infer.autoguide import AutoDelta, AutoNormal

    def model():
        with pyro.plate("p", 3):
            a = pyro.sample("a", dist.Normal(0.0, 1.0))
        b = pyro.sample("b", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(a.sum() + b, 1.0), obs=jnp.asarray(0.5))

    for cls in (AutoNormal, AutoDelta):
        pyro.clear_param_store()
        guide = cls(model)
        tr = poutine.trace(poutine.seed(guide, 0)).get_trace()
        assert jnp.shape(tr.nodes["a"]["value"]) == (3,), cls.__name__
        assert jnp.shape(tr.nodes["b"]["value"]) == (), cls.__name__
        assert tr.nodes["b"]["cond_indep_stack"] == (), cls.__name__
