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


def test_step_param_materializes_under_control_flow():
    """A param that first appears at step N (data-dependent Python branch)
    must trigger the lazy re-init path, not a crash (``svi.py:152-158``)."""
    import pyro_tpu as pyro
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    pyro.clear_param_store()
    phase = {"n": 0}

    def model():
        pyro.sample("z", dist.Normal(0.0, 1.0))

    def guide():
        loc = pyro.param("loc", jnp.zeros(()))
        if phase["n"] >= 3:
            # a second param materializes only later in training
            extra = pyro.param("late_scale", jnp.ones(()))
            pyro.sample("z", dist.Normal(loc, extra))
        else:
            pyro.sample("z", dist.Normal(loc, 1.0))

    # Python-side state changes are invisible to a cached compiled step;
    # check_structure_every re-traces the loss abstractly each k steps
    # (the same per-step Python cost the reference pays for eager
    # execution) and re-initializes when a new param materializes.
    svi = SVI(
        model,
        guide,
        Adam({"lr": 1e-3}),
        Trace_ELBO(),
        check_structure_every=1,
    )
    losses = []
    for i in range(6):
        phase["n"] = i
        losses.append(svi.step())
    assert all(np.isfinite(losses)), losses
    assert "late_scale" in pyro.get_param_store().keys()


def test_run_steps_matches_step_loop():
    """One scanned run_steps(n) program equals n eager step() calls given
    the same keys."""
    import jax
    import pyro_tpu as pyro
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    data = jax.random.normal(jax.random.key(0), (20,)) + 1.0

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        with pyro.plate("data", 20):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        q = pyro.param("q_loc", jnp.zeros(()))
        pyro.sample("loc", dist.Normal(q, 0.1))

    pyro.clear_param_store()
    pyro.set_rng_seed(0)
    svi1 = SVI(model, guide, Adam({"lr": 0.1}), Trace_ELBO())
    svi1.run_steps(30, data, rng_key=jax.random.key(42))
    scanned = float(pyro.param("q_loc"))

    pyro.clear_param_store()
    pyro.set_rng_seed(0)
    svi2 = SVI(model, guide, Adam({"lr": 0.1}), Trace_ELBO())
    keys = jax.random.split(jax.random.key(42), 30)
    for k in keys:
        svi2.step(data, rng_key=k)
    eager = float(pyro.param("q_loc"))
    assert abs(scanned - eager) < 1e-4, (scanned, eager)
