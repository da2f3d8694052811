"""Enumeration-vs-brute-force sweeps over randomized model structures.

Mirrors the reference's exhaustive enumeration checks
(``tests/infer/test_enum.py``): for small discrete models of varying
topology (chains, trees, plates, mixed observation patterns), the
TraceEnum_ELBO loss must equal the exact ELBO computed by brute-force
summation over every joint assignment of the enumerated latents.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import TraceEnum_ELBO, config_enumerate

pytestmark = pytest.mark.stage("integration")


def brute_force_log_z(model, latents):
    """log sum_z exp(log p(z, x)) by conditioning each enumerated
    assignment and scoring the full trace."""
    names = list(latents)
    totals = []
    for assignment in itertools.product(
        *(range(k) for k in latents.values())
    ):
        data = {
            name: jnp.asarray(v)
            for name, v in zip(names, assignment)
        }
        tr = poutine.trace(
            poutine.seed(poutine.condition(model, data=data), 0)
        ).get_trace()
        totals.append(float(tr.log_prob_sum()))
    return float(jax.scipy.special.logsumexp(jnp.asarray(totals)))


def enum_loss(model):
    """TraceEnum_ELBO with an empty guide = -log evidence when all
    latents are enumerated in the model."""
    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    return -float(
        elbo.loss(
            config_enumerate(model),
            lambda: None,
            rng_key=jax.random.key(0),
        )
    )


def test_chain_3():
    """x -> y -> z chain with an observation at the end."""
    P = jnp.asarray([[0.7, 0.3], [0.2, 0.8]])

    def model():
        x = pyro.sample("x", dist.Categorical(jnp.asarray([0.4, 0.6])))
        y = pyro.sample("y", dist.Categorical(P[x]))
        z = pyro.sample("z", dist.Categorical(P[y]))
        pyro.sample(
            "obs", dist.Normal(jnp.asarray(z, jnp.float32), 1.0),
            obs=jnp.asarray(0.7),
        )

    actual = enum_loss(model)
    expected = brute_force_log_z(model, {"x": 2, "y": 2, "z": 2})
    assert np.allclose(actual, expected, atol=1e-4), (actual, expected)


def test_tree_branching():
    """One root with two conditionally independent children, each
    observed."""
    P = jnp.asarray(
        [[0.6, 0.3, 0.1], [0.1, 0.5, 0.4], [0.25, 0.25, 0.5]]
    )

    def model():
        r = pyro.sample(
            "r", dist.Categorical(jnp.asarray([0.2, 0.3, 0.5]))
        )
        a = pyro.sample("a", dist.Categorical(P[r]))
        b = pyro.sample("b", dist.Categorical(P[r]))
        pyro.sample(
            "obs_a",
            dist.Normal(jnp.asarray(a, jnp.float32), 0.8),
            obs=jnp.asarray(1.2),
        )
        pyro.sample(
            "obs_b",
            dist.Normal(jnp.asarray(b, jnp.float32), 0.8),
            obs=jnp.asarray(-0.4),
        )

    actual = enum_loss(model)
    expected = brute_force_log_z(model, {"r": 3, "a": 3, "b": 3})
    assert np.allclose(actual, expected, atol=1e-4), (actual, expected)


def test_latent_inside_plate():
    """Vectorized latents inside a plate, mixture-of-Normals
    observation."""
    data = jnp.asarray([0.1, 2.3, -1.0, 0.4])
    locs = jnp.asarray([-1.0, 0.0, 2.0])

    def model():
        w = pyro.sample(
            "w", dist.Dirichlet(jnp.ones(3)).mask(False)
        )  # fixed nuisance, not enumerated
        with pyro.plate("data", 4):
            z = pyro.sample(
                "z", dist.Categorical(jnp.asarray([0.3, 0.4, 0.3]))
            )
            pyro.sample("obs", dist.Normal(locs[z], 1.0), obs=data)

    def brute():
        # independent across the plate: product of per-datum mixtures
        total = 0.0
        probs = np.asarray([0.3, 0.4, 0.3])
        for x in np.asarray(data):
            comps = [
                np.log(probs[k])
                + float(dist.Normal(float(locs[k]), 1.0).log_prob(x))
                for k in range(3)
            ]
            total += float(jax.scipy.special.logsumexp(jnp.asarray(comps)))
        return total

    elbo = TraceEnum_ELBO(max_plate_nesting=1)

    def guide():
        # mask(False) site must still appear in the guide
        pyro.sample("w", dist.Dirichlet(jnp.ones(3)).mask(False))

    actual = -float(
        elbo.loss(
            config_enumerate(model), guide, rng_key=jax.random.key(0)
        )
    )
    expected = brute()
    assert np.allclose(actual, expected, atol=1e-4), (actual, expected)


def test_markov_chain_length_sweep():
    """pyro.markov chains of several lengths against forward-algorithm
    brute force."""
    P = jnp.asarray([[0.8, 0.2], [0.3, 0.7]])
    E = jnp.asarray([[0.9, 0.1], [0.4, 0.6]])

    for T in [2, 3, 5]:
        obs = (jnp.arange(T) % 2).astype(jnp.int32)

        def model(T=T, obs=obs):
            x = pyro.sample(
                "x_0", dist.Categorical(jnp.asarray([0.5, 0.5]))
            )
            pyro.sample(
                "y_0", dist.Categorical(E[x]), obs=obs[0]
            )
            for t in pyro.markov(range(1, T)):
                x = pyro.sample(f"x_{t}", dist.Categorical(P[x]))
                pyro.sample(
                    f"y_{t}", dist.Categorical(E[x]), obs=obs[t]
                )

        actual = enum_loss(model)
        # exact forward algorithm in numpy
        alpha = np.asarray([0.5, 0.5]) * np.asarray(E)[:, int(obs[0])]
        for t in range(1, T):
            alpha = (alpha @ np.asarray(P)) * np.asarray(E)[:, int(obs[t])]
        expected = float(np.log(alpha.sum()))
        assert np.allclose(actual, expected, atol=1e-4), (
            T,
            actual,
            expected,
        )


def test_random_dag_sweep():
    """Randomized two-layer DAGs: parents -> children with random CPTs,
    children observed through Normal emissions."""
    rng = np.random.RandomState(0)
    for trial in range(3):
        k1, k2 = rng.randint(2, 4), rng.randint(2, 4)
        p_root = rng.dirichlet(np.ones(k1))
        cpt = rng.dirichlet(np.ones(k2), size=k1)
        emit_loc = rng.randn(k2)
        x_obs = float(rng.randn())

        p_root_j = jnp.asarray(p_root)
        cpt_j = jnp.asarray(cpt)
        emit_j = jnp.asarray(emit_loc)

        def model():
            u = pyro.sample("u", dist.Categorical(p_root_j))
            v = pyro.sample("v", dist.Categorical(cpt_j[u]))
            pyro.sample(
                "obs",
                dist.Normal(emit_j[v], 1.0),
                obs=jnp.asarray(x_obs),
            )

        actual = enum_loss(model)
        expected = brute_force_log_z(model, {"u": k1, "v": k2})
        assert np.allclose(actual, expected, atol=1e-4), (
            trial,
            actual,
            expected,
        )
