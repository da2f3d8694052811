"""SVI end-to-end tests: conjugate Gaussian with analytic posterior.

Mirrors the reference's integration strategy
(``tests/integration_tests/test_conjugate_gaussian_models.py``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO, TraceMeanField_ELBO
from pyro_tpu.optim import Adam, ClippedAdam


def _conjugate_model_guide():
    data = jnp.array([1.0, 2.0, 3.0])

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        loc = pyro.param("guide_loc", 0.0)
        scale = pyro.param(
            "guide_scale", 1.0, constraint=dist.constraints.positive
        )
        pyro.sample("loc", dist.Normal(loc, scale))

    # analytic posterior
    post_var = 1.0 / (1.0 / 100.0 + 3.0)
    post_loc = post_var * jnp.sum(data)
    return model, guide, data, post_loc, post_var**0.5


@pytest.mark.parametrize("elbo_cls", [Trace_ELBO, TraceMeanField_ELBO])
def test_conjugate_gaussian_converges(elbo_cls):
    model, guide, data, post_loc, post_scale = _conjugate_model_guide()
    svi = SVI(model, guide, Adam({"lr": 0.05}), elbo_cls(num_particles=8))
    for _ in range(2000):
        svi.step(data)
    store = pyro.get_param_store()
    assert np.allclose(store["guide_loc"], post_loc, atol=0.12)
    assert np.allclose(store["guide_scale"], post_scale, atol=0.12)


def test_loss_decreases():
    model, guide, data, *_ = _conjugate_model_guide()
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=4))
    first = np.mean([svi.step(data) for _ in range(50)])
    for _ in range(500):
        svi.step(data)
    last = np.mean([svi.step(data) for _ in range(50)])
    assert last < first


def test_evaluate_loss_no_side_effect():
    model, guide, data, *_ = _conjugate_model_guide()
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO())
    svi.step(data)
    store = pyro.get_param_store()
    before = jax.device_get(store["guide_loc"])
    svi.evaluate_loss(data)
    after = jax.device_get(store["guide_loc"])
    assert np.allclose(before, after)


def test_subsampled_plate_scaling():
    """Subsampling scales the data term by size/subsample_size."""
    N, S = 100, 20
    full = jnp.ones(N) * 2.0

    def model(data, idx=None):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("data", N, subsample_size=S) as ind:
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data[ind])

    def guide(data, idx=None):
        loc = pyro.param("guide_loc", 0.0)
        scale = pyro.param(
            "guide_scale", 0.5, constraint=dist.constraints.positive
        )
        pyro.sample("loc", dist.Normal(loc, scale))

    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=4))
    for _ in range(1500):
        svi.step(full)
    store = pyro.get_param_store()
    # posterior with all 100 identical points: var=1/(1/100+100), mean ~ 2
    assert np.allclose(store["guide_loc"], 2.0, atol=0.15)


def test_score_function_estimator():
    """Non-reparameterized guide site exercises the REINFORCE path."""

    class NonReparamNormal(dist.Normal):
        has_rsample = False

        def sample(self, key, sample_shape=()):
            return jax.lax.stop_gradient(self.rsample(key, sample_shape))

    data = jnp.array([0.5])

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 2.0))
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        loc = pyro.param("g_loc", 0.0)
        pyro.sample("loc", NonReparamNormal(loc, 0.5))

    svi = SVI(model, guide, Adam({"lr": 0.03}), Trace_ELBO(num_particles=32))
    for _ in range(1500):
        svi.step(data)
    store = pyro.get_param_store()
    post_var = 1.0 / (1.0 / 4.0 + 1.0)
    post_loc = post_var * 0.5
    assert np.allclose(store["g_loc"], post_loc, atol=0.2)


def test_clipped_adam_runs():
    model, guide, data, *_ = _conjugate_model_guide()
    svi = SVI(
        model, guide, ClippedAdam({"lr": 0.05, "clip_norm": 5.0}), Trace_ELBO()
    )
    losses = [svi.step(data) for _ in range(20)]
    assert np.isfinite(losses).all()
