"""OED EIG estimator tests (mirrors ``tests/contrib/oed``): compare
against the analytic EIG of a conjugate Gaussian design problem."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.oed import nmc_eig, posterior_eig


def make_model(sigma=1.0):
    def model(design):
        # design: scalar scaling of the measurement
        theta = pyro.sample("theta", dist.Normal(0.0, 1.0))
        pyro.sample("y", dist.Normal(design * theta, sigma))
        return theta

    return model


def analytic_eig(design, sigma=1.0):
    # linear-Gaussian: EIG = 0.5 log(1 + d^2 / sigma^2)
    return 0.5 * np.log1p(design**2 / sigma**2)


@pytest.mark.parametrize("design", [0.5, 1.0, 2.0])
def test_nmc_eig_matches_analytic(design):
    model = make_model()
    eig = float(
        nmc_eig(
            model,
            jnp.asarray(design),
            "y",
            "theta",
            N=1500,
            M=1500,
            rng_key=jax.random.key(0),
        )
    )
    expected = analytic_eig(design)
    assert abs(eig - expected) < 0.12, (eig, expected)


def test_nmc_eig_ranks_designs():
    model = make_model()
    eigs = [
        float(
            nmc_eig(model, jnp.asarray(d), "y", "theta", N=400, M=400,
                    rng_key=jax.random.key(1))
        )
        for d in (0.1, 1.0, 3.0)
    ]
    assert eigs[0] < eigs[1] < eigs[2]


def test_posterior_eig_trains_guide():
    model = make_model()

    def guide(y_dict, design, observation_labels, target_labels):
        y = y_dict["y"]
        w = pyro.param("w", 0.0)
        s = pyro.param("s", 1.0, constraint=dist.constraints.positive)
        pyro.sample("theta", dist.Normal(w * y, s))

    bound = float(
        posterior_eig(
            model,
            jnp.asarray(1.0),
            "y",
            "theta",
            num_samples=200,
            num_steps=300,
            guide=guide,
            rng_key=jax.random.key(2),
        )
    )
    # posterior_eig returns the EIG = H(prior) - APE (ref
    # _eig_from_ape); with unit prior/noise the true EIG is
    # 0.5 log(1 + 1/1) = 0.5 log 2
    expected = 0.5 * np.log(2.0)
    assert abs(bound - expected) < 0.15, (bound, expected)


def test_donsker_varadhan_eig_linear_gaussian():
    """DV bound approaches the analytic EIG 0.5*log(1+d^2) on the
    linear-Gaussian design problem (ref ``eig.py:376``)."""
    from pyro_tpu.contrib.oed.eig import donsker_varadhan_eig
    from pyro_tpu.optim import Adam

    def model(design):
        theta = pyro.sample("theta", dist.Normal(0.0, 1.0))
        pyro.sample("y", dist.Normal(design * theta, 1.0))

    def T(design, trace, obs_labels, target_labels):
        y = trace.nodes["y"]["value"]
        th = trace.nodes["theta"]["value"]
        w = pyro.param("T$$$w", jnp.zeros(5))
        b = pyro.param("T$$$b", jnp.zeros(()))
        feats = jnp.stack([y, th, y * y, th * th, y * th])
        return b + jnp.dot(w, feats)

    pyro.clear_param_store()
    eig, hist = donsker_varadhan_eig(
        model,
        1.0,
        "y",
        "theta",
        num_samples=512,
        num_steps=500,
        T=T,
        optim=Adam({"lr": 0.02}),
        final_num_samples=4096,
        return_history=True,
        rng_key=jax.random.key(0),
    )
    true_eig = 0.5 * np.log(2.0)
    assert abs(float(eig) - true_eig) < 0.08, (float(eig), true_eig)
    assert hist.shape == (500,)
