"""Predictive / WeighedPredictive / MHResampler coverage
(ref ``tests/infer/test_predictive.py`` strategy: shape contracts,
parallel-vs-sequential agreement, guided posterior-predictive accuracy,
and importance-weight identities).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import AutoNormal
from pyro_tpu.infer.predictive import (
    MHResampler,
    Predictive,
    WeighedPredictive,
)
from pyro_tpu.optim import Adam


def model(y=None):
    mu = pyro.sample("mu", dist.Normal(0.0, 1.0))
    with pyro.plate("data", 5):
        return pyro.sample("obs", dist.Normal(mu, 1.0), obs=y)


Y = jnp.array([1.8, 2.2, 2.0, 1.9, 2.1])


def test_prior_predictive_shapes():
    pred = Predictive(model, num_samples=7)
    out = pred(rng_key=jax.random.key(0))
    assert set(out) == {"mu", "obs"}
    assert out["mu"].shape == (7,)
    assert out["obs"].shape == (7, 5)


def test_posterior_samples_passthrough_excluded_from_output():
    mus = jnp.linspace(-1.0, 1.0, 9)
    pred = Predictive(model, posterior_samples={"mu": mus})
    out = pred(rng_key=jax.random.key(0))
    # supplied sites are conditioned, not returned (default return set)
    assert "mu" not in out
    assert out["obs"].shape == (9, 5)
    # the draws actually used the supplied mu: per-row obs means track it
    assert np.corrcoef(np.asarray(mus), np.asarray(out["obs"]).mean(-1))[
        0, 1
    ] > 0.9


def test_return_sites_filters():
    pred = Predictive(model, num_samples=4, return_sites=["obs"])
    out = pred(rng_key=jax.random.key(1))
    assert set(out) == {"obs"}


def test_parallel_matches_sequential():
    mus = jnp.linspace(-1.0, 1.0, 6)
    out_p = Predictive(model, posterior_samples={"mu": mus})(
        rng_key=jax.random.key(3)
    )
    out_s = Predictive(
        model, posterior_samples={"mu": mus}, parallel=False
    )(rng_key=jax.random.key(3))
    np.testing.assert_allclose(
        np.asarray(out_p["obs"]), np.asarray(out_s["obs"]), rtol=1e-5
    )


def test_constructor_validation():
    with pytest.raises(ValueError):
        Predictive(model)
    with pytest.raises(ValueError):
        Predictive(
            model,
            posterior_samples={"mu": jnp.zeros(3)},
            num_samples=5,
        )


def test_guided_posterior_predictive_recovers_posterior():
    pyro.clear_param_store()
    guide = AutoNormal(model)
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=4))
    svi.run_steps(600, Y)
    pred = Predictive(model, guide=guide, num_samples=2000,
                      return_sites=["mu", "obs"])
    out = pred(rng_key=jax.random.key(5))
    # conjugate posterior: mu | Y ~ N(sum(Y)/6, 1/6)
    post_mean = float(Y.sum() / 6.0)
    assert abs(float(out["mu"].mean()) - post_mean) < 0.1
    # predictive variance = posterior var + obs var
    assert abs(float(out["obs"].var()) - (1.0 / 6.0 + 1.0)) < 0.2


def test_weighed_predictive_identities():
    pyro.clear_param_store()
    guide = AutoNormal(model)
    Trace_ELBO().loss(model, guide, Y)  # init guide params
    wp = WeighedPredictive(model, guide=guide, num_samples=64)
    res = wp.get_samples(Y, rng_key=jax.random.key(0))
    assert res.log_weights.shape == (64,)
    np.testing.assert_allclose(
        np.asarray(res.log_weights),
        np.asarray(res.model_log_prob - res.guide_log_prob),
        rtol=1e-5,
    )
    assert "mu" in res.samples
    # observed sites are not resampled into the output by default
    assert res.samples["mu"].shape == (64,)


def test_weighed_predictive_requires_guide():
    wp = WeighedPredictive(model, num_samples=4)
    with pytest.raises(ValueError):
        wp.get_samples(Y, rng_key=jax.random.key(0))


def test_mh_resampler_improves_posterior_fit():
    # prior-as-guide is deliberately broad/offset; MH resampling over
    # importance weights should pull the sample mean toward the true
    # posterior mean sum(Y)/6
    pyro.clear_param_store()

    def prior_guide(y=None):
        pyro.sample("mu", dist.Normal(0.0, 1.0))

    wp = WeighedPredictive(model, guide=prior_guide, num_samples=512)
    resampler = MHResampler(wp)
    for _ in range(25):
        res = resampler(Y, rng_key=None)
    post_mean = float(Y.sum() / 6.0)
    raw_mean = 0.0  # the guide's mean
    resampled_mean = float(res.samples["mu"].mean())
    assert abs(resampled_mean - post_mean) < abs(raw_mean - post_mean)
    assert abs(resampled_mean - post_mean) < 0.25
