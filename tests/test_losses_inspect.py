"""Tests for TMC/tail-adaptive/MMD/energy losses and model inspection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import (
    SVI,
    EnergyDistance,
    TraceTMC_ELBO,
    TraceTailAdaptive_ELBO,
    Trace_MMD,
    get_dependencies,
    render_model,
)
from pyro_tpu.optim import Adam

DATA = jnp.array([1.0, 2.0, 3.0])


def model(data):
    loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
    with pyro.plate("data", data.shape[0]):
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)


def guide(data):
    m = pyro.param("m", 0.0)
    s = pyro.param("s", 1.0, constraint=dist.constraints.positive)
    pyro.sample("loc", dist.Normal(m, s))


def test_tmc_elbo_matches_exact_for_exhaustive():
    """With exhaustive enumeration, TMC == exact -log marginal."""
    probs = jnp.array([0.3, 0.7])
    locs = jnp.array([-1.0, 1.0])
    data = jnp.array(0.6)

    def m():
        z = pyro.sample(
            "z",
            dist.Categorical(probs=probs),
            infer={"enumerate": "parallel"},
        )
        pyro.sample("obs", dist.Normal(locs[z], 1.0), obs=data)

    def g():
        pass

    elbo = TraceTMC_ELBO(max_plate_nesting=0)
    loss = elbo.loss(m, g, rng_key=jax.random.key(0))
    from scipy.special import logsumexp

    expected = -logsumexp(
        np.log(np.asarray(probs))
        + np.asarray(dist.Normal(locs, 1.0).log_prob(data))
    )
    assert np.allclose(loss, expected, rtol=1e-4)


def test_tmc_multi_sample():
    """num_samples-based TMC gives a finite consistent estimate."""

    def m():
        z = pyro.sample(
            "z",
            dist.Normal(0.0, 1.0),
            infer={"enumerate": "parallel", "num_samples": 16},
        )
        pyro.sample("obs", dist.Normal(z, 1.0), obs=jnp.array(0.5))

    def g():
        pass

    elbo = TraceTMC_ELBO(max_plate_nesting=0)
    losses = [
        elbo.loss(m, g, rng_key=jax.random.key(i)) for i in range(20)
    ]
    from scipy.stats import norm

    exact = -norm.logpdf(0.5, 0, np.sqrt(2))
    assert abs(np.mean(losses) - exact) < 0.1, (np.mean(losses), exact)


def test_tail_adaptive_trains():
    svi = SVI(
        model,
        guide,
        Adam({"lr": 0.05}),
        TraceTailAdaptive_ELBO(num_particles=8),
    )
    for _ in range(800):
        svi.step(DATA)
    assert abs(float(pyro.get_param_store()["m"]) - 1.99) < 0.4


def test_trace_mmd_trains():
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_MMD(num_particles=6))
    losses = [svi.step(DATA) for _ in range(300)]
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_energy_distance_stable_regression():
    """Fit a location with a Stable likelihood (log_prob-free)."""
    data = jnp.full((20,), 3.0) + 0.3 * jax.random.normal(
        jax.random.key(0), (20,)
    )

    def m(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample(
                "obs", dist.Stable(1.7, 0.0, 0.3, loc), obs=data
            )

    def g(data):
        loc = pyro.param("g_loc", 0.0)
        pyro.sample("loc", dist.Delta(loc))

    svi = SVI(
        m, g, Adam({"lr": 0.1}), EnergyDistance(num_particles=8)
    )
    for _ in range(500):
        svi.step(data)
    assert abs(float(pyro.get_param_store()["g_loc"]) - 3.0) < 0.5


def test_get_dependencies():
    def m():
        a = pyro.sample("a", dist.Normal(0.0, 1.0))
        b = pyro.sample("b", dist.Normal(a, 1.0))
        c = pyro.sample("c", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(b + c, 1.0), obs=jnp.array(1.0))

    deps = get_dependencies(m)["prior_dependencies"]
    assert "a" in deps["b"]
    assert "a" not in deps["c"]
    assert "b" in deps["obs"] and "c" in deps["obs"]


def test_get_dependencies_discrete():
    def m():
        z = pyro.sample("z", dist.Categorical(probs=jnp.array([0.5, 0.5])))
        locs = jnp.array([-1.0, 1.0])
        pyro.sample("obs", dist.Normal(locs[z], 1.0), obs=jnp.array(0.5))

    deps = get_dependencies(m)["prior_dependencies"]
    assert "z" in deps["obs"]


def test_render_model_dot():
    dot = render_model(lambda: model(DATA), render_distributions=True)
    assert "digraph" in dot
    assert '"loc" -> "obs"' in dot
    assert "Normal" in dot
