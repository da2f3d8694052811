"""Tests for TraceGraph_ELBO, RenyiELBO, Importance, RWS, SMC, SVGD."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import (
    SVGD,
    SVI,
    Importance,
    RBFSteinKernel,
    RenyiELBO,
    ReweightedWakeSleep,
    SMCFilter,
    TraceGraph_ELBO,
    Trace_ELBO,
    psis_diagnostic,
)
from pyro_tpu.optim import Adam

DATA = jnp.array([1.0, 2.0, 3.0])
POST_VAR = 1.0 / (1.0 / 100.0 + 3.0)
POST_LOC = POST_VAR * 6.0


def model(data):
    loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
    with pyro.plate("data", data.shape[0]):
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)


def guide(data):
    loc = pyro.param("g_loc", 0.0)
    scale = pyro.param(
        "g_scale", 1.0, constraint=dist.constraints.positive
    )
    pyro.sample("loc", dist.Normal(loc, scale))


def test_tracegraph_elbo_converges():
    svi = SVI(
        model, guide, Adam({"lr": 0.05}), TraceGraph_ELBO(num_particles=8)
    )
    for _ in range(2000):
        svi.step(DATA)
    store = pyro.get_param_store()
    assert np.allclose(store["g_loc"], POST_LOC, atol=0.15)


def test_tracegraph_nonreparam_variance_reduction():
    """TraceGraph should train a non-reparam site without diverging."""

    class NonReparamNormal(dist.Normal):
        has_rsample = False

        def sample(self, key, sample_shape=()):
            return jax.lax.stop_gradient(self.rsample(key, sample_shape))

    def nr_guide(data):
        loc = pyro.param("g_loc", 0.0)
        pyro.sample("loc", NonReparamNormal(loc, 0.5))

    svi = SVI(
        model, nr_guide, Adam({"lr": 0.03}), TraceGraph_ELBO(num_particles=16)
    )
    for _ in range(1500):
        svi.step(DATA)
    store = pyro.get_param_store()
    assert np.abs(np.asarray(store["g_loc"]) - POST_LOC) < 0.35


def test_renyi_elbo_iwae():
    svi = SVI(
        model, guide, Adam({"lr": 0.05}), RenyiELBO(alpha=0.0, num_particles=8)
    )
    losses = [svi.step(DATA) for _ in range(1000)]
    store = pyro.get_param_store()
    # IWAE bound is tighter than ELBO: final loss <= -log-evidence tolerance
    assert np.abs(np.asarray(store["g_loc"]) - POST_LOC) < 0.3
    assert np.isfinite(losses).all()


def test_importance_sampling():
    imp = Importance(model, guide=None, num_samples=5000).run(
        DATA, rng_key=jax.random.key(0)
    )
    w = imp.get_normalized_weights()
    samples = imp.get_samples()["loc"]
    post_mean = float(jnp.sum(w * samples))
    assert abs(post_mean - POST_LOC) < 0.25
    assert float(imp.get_ESS()) > 10


def test_psis_diagnostic_good_fit():
    # train guide well first
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
    for _ in range(2000):
        svi.step(DATA)
    k = psis_diagnostic(
        model, guide, DATA, num_particles=2000, rng_key=jax.random.key(1)
    )
    assert k < 0.7, k


def test_rws_losses():
    rws = ReweightedWakeSleep(num_particles=4, insomnia=1.0)
    theta_loss, phi_loss = rws.loss(model, guide, DATA, rng_key=jax.random.key(0))
    assert np.isfinite(theta_loss) and np.isfinite(phi_loss)
    svi = SVI(model, guide, Adam({"lr": 0.05}), rws)
    for _ in range(300):
        svi.step(DATA)
    store = pyro.get_param_store()
    assert np.isfinite(np.asarray(store["g_loc"]))


def test_smc_filter_tracks_state():
    """Linear-Gaussian tracking: SMC posterior follows the data."""

    class Model:
        def init(self, state):
            state["z"] = pyro.sample("z_init", dist.Normal(0.0, 1.0))

        def step(self, state, y):
            state["z"] = pyro.sample(
                "z_step", dist.Normal(state["z"], 0.5)
            )
            pyro.sample("y", dist.Normal(state["z"], 0.3), obs=y)

    class Guide:
        def init(self, state):
            pyro.sample("z_init", dist.Normal(0.0, 1.0))

        def step(self, state, y):
            pyro.sample("z_step", dist.Normal(y, 0.5))

    smc = SMCFilter(Model(), Guide(), num_particles=256, max_plate_nesting=0)
    smc.init()
    ys = [0.5, 1.0, 2.0, 3.0]
    for y in ys:
        smc.step(jnp.asarray(y))
    emp = smc.get_empirical()
    assert abs(float(emp["z"]["mean"]) - 3.0) < 0.6


def test_svgd_matches_gaussian_target():
    def target_model():
        pyro.sample("x", dist.Normal(2.0, 1.5))

    kernel = RBFSteinKernel()
    svgd = SVGD(target_model, kernel, Adam({"lr": 0.1}), num_particles=100, max_plate_nesting=0)
    for _ in range(500):
        svgd.step()
    particles = svgd.get_named_particles()["x"]
    assert abs(float(particles.mean()) - 2.0) < 0.3
    assert abs(float(particles.std()) - 1.5) < 0.4


def test_resampler_recovers_model_posterior():
    """Importance resampling of diffuse-guide draws matches a narrower
    model prior (ref ``resampler.py:14``)."""
    from pyro_tpu.infer import Resampler

    def guide():
        pyro.sample("loc", dist.Normal(0.0, 4.0))

    def simulator():
        loc = pyro.sample("loc", dist.Normal(0.0, 4.0))
        pyro.sample("x", dist.Normal(loc, 1.0))

    def model():
        pyro.sample("loc", dist.Normal(1.0, 0.5))

    rs = Resampler(guide, simulator, num_guide_samples=10000)
    out = rs.sample(model, 2000)
    locs = np.asarray(out["loc"])
    assert abs(locs.mean() - 1.0) < 0.15
    assert abs(locs.std() - 0.5) < 0.15
    assert np.asarray(out["x"]).shape == (2000,)
    out2 = rs.sample(model, 2000, stable=False)
    assert abs(np.asarray(out2["loc"]).mean() - 1.0) < 0.15
