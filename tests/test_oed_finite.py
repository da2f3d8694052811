"""Finite-space EIG against the exact value (ports the reference's
``tests/contrib/oed/test_finite_spaces_eig.py``): a Bernoulli
theta/observation model whose EIG at design 0.5 is exactly
0.1258036690947...; every estimator must land on it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.oed.eig import (
    donsker_varadhan_eig,
    marginal_eig,
    nmc_eig,
    posterior_eig,
    vnmc_eig,
)
from pyro_tpu.optim import Adam

TRUE_EIG = 0.12580366909478014


def model(design):
    theta = pyro.sample("theta", dist.Bernoulli(0.4))
    pyro.sample("y", dist.Bernoulli((design + theta) / 2.0))


DESIGN = jnp.asarray(0.5)


def test_exact_value_sanity():
    """Brute-force the EIG over the 2x2 outcome table."""
    p_theta = jnp.asarray([0.6, 0.4])
    p_y_given = jnp.stack(
        [
            jnp.asarray([1 - DESIGN / 2, DESIGN / 2]),
            jnp.asarray([1 - (DESIGN + 1) / 2, (DESIGN + 1) / 2]),
        ]
    )
    p_y = p_theta @ p_y_given
    mi = 0.0
    for t in range(2):
        for y in range(2):
            joint = p_theta[t] * p_y_given[t, y]
            mi += joint * (jnp.log(p_y_given[t, y]) - jnp.log(p_y[y]))
    np.testing.assert_allclose(float(mi), TRUE_EIG, rtol=1e-6)


def test_nmc_eig_finite_space():
    eig = nmc_eig(
        model, DESIGN, "y", "theta", N=4000, M=4000,
        rng_key=jax.random.key(0),
    )
    np.testing.assert_allclose(float(eig), TRUE_EIG, atol=0.03)


def test_marginal_eig_finite_space():
    eig = marginal_eig(
        model, DESIGN, "y", "theta", num_samples=4000,
        rng_key=jax.random.key(1),
    )
    np.testing.assert_allclose(float(eig), TRUE_EIG, atol=0.03)


def test_posterior_eig_finite_space():
    def posterior_guide(y_dict, design, observation_labels, target_labels):
        y = y_dict["y"]
        a = pyro.param("a", jnp.asarray(0.0))
        b = pyro.param("b", jnp.asarray(0.0))
        pyro.sample("theta", dist.Bernoulli(logits=a + b * y))

    pyro.clear_param_store()
    eig = posterior_eig(
        model, DESIGN, "y", "theta",
        num_samples=200, num_steps=1200, guide=posterior_guide,
        optim=Adam({"lr": 0.05}), final_num_samples=4000,
        rng_key=jax.random.key(2),
    )
    np.testing.assert_allclose(float(eig), TRUE_EIG, atol=0.04)


def test_vnmc_eig_finite_space():
    def posterior_guide(y_dict, design, observation_labels, target_labels):
        y = y_dict["y"]
        a = pyro.param("a", jnp.asarray(0.0))
        b = pyro.param("b", jnp.asarray(0.0))
        pyro.sample("theta", dist.Bernoulli(logits=a + b * y))

    pyro.clear_param_store()
    eig = vnmc_eig(
        model, DESIGN, "y", "theta",
        num_samples=(200, 40), num_steps=1200, guide=posterior_guide,
        optim=Adam({"lr": 0.05}), final_num_samples=(2000, 100),
        rng_key=jax.random.key(3),
    )
    np.testing.assert_allclose(float(eig), TRUE_EIG, atol=0.04)


def test_dv_eig_finite_space():
    def dv_critic(design, trace, observation_labels, target_labels):
        y = trace.nodes["y"]["value"]
        theta = trace.nodes["theta"]["value"]
        w_y = pyro.param("w_y", jnp.asarray(0.0))
        w_t = pyro.param("w_t", jnp.asarray(0.0))
        w_yt = pyro.param("w_yt", jnp.asarray(0.0))
        return y * w_y + theta * w_t + y * theta * w_yt

    pyro.clear_param_store()
    eig = donsker_varadhan_eig(
        model, DESIGN, "y", "theta",
        num_samples=400, num_steps=1500, T=dv_critic,
        optim=Adam({"lr": 0.05}), final_num_samples=4000,
        rng_key=jax.random.key(4),
    )
    np.testing.assert_allclose(float(eig), TRUE_EIG, atol=0.05)
