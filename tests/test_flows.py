"""Normalizing-flow tests: bijectivity, Jacobians, training.

Mirrors ``tests/distributions/test_transforms.py`` strategy: numerical
Jacobian checks + density-matching training.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions import flows
from pyro_tpu.distributions.distribution import TransformedDistribution
from pyro_tpu.infer import SVI, AutoIAFNormal, Trace_ELBO
from pyro_tpu.optim import Adam

KEY = jax.random.key(0)
D = 4


def _numeric_ladj(transform, x):
    """log|det J| via jax.jacfwd, one input at a time."""
    J = jax.jacfwd(transform.__call__)(x)
    return jnp.linalg.slogdet(J)[1]


def _random_flow(name):
    pyro.clear_param_store()
    from pyro_tpu.nn import clear_module_registry

    clear_module_registry()
    k = jax.random.key(7)
    if name == "affine_autoregressive":
        return flows.affine_autoregressive("aa", D)
    if name == "affine_coupling":
        return flows.affine_coupling("ac", D)
    if name == "spline":
        # random (not zero) params so the test is nontrivial
        w = jax.random.normal(k, (D, 8))
        h = jax.random.normal(jax.random.fold_in(k, 1), (D, 8))
        d = jax.random.normal(jax.random.fold_in(k, 2), (D, 7))
        return flows.Spline(w, h, d)
    if name == "householder":
        return flows.householder("hh", D, count_transforms=2)
    if name == "permute":
        return flows.permute(jnp.array([2, 0, 3, 1]))
    if name == "planar":
        return flows.planar("pl", D)
    if name == "radial":
        return flows.radial("ra", D)
    raise ValueError(name)


INVERTIBLE = [
    "affine_autoregressive",
    "affine_coupling",
    "spline",
    "householder",
    "permute",
]
FORWARD_ONLY = ["planar", "radial"]


@pytest.mark.parametrize("name", INVERTIBLE)
def test_flow_inverse(name):
    t = _random_flow(name)
    x = jax.random.normal(KEY, (7, D))
    y = t(x)
    x2 = t._inverse(y)
    assert np.allclose(np.asarray(x), np.asarray(x2), atol=1e-3), name


@pytest.mark.parametrize("name", INVERTIBLE + FORWARD_ONLY)
def test_flow_jacobian(name):
    t = _random_flow(name)
    x = jax.random.normal(KEY, (D,)) * 0.5
    actual = t.log_abs_det_jacobian(x, t(x))
    expected = _numeric_ladj(t, x)
    assert np.allclose(
        np.asarray(actual), np.asarray(expected), atol=1e-3
    ), (name, actual, expected)


def test_transformed_distribution_with_flow_trains():
    """Fit a spline flow to a shifted target by max likelihood."""
    target = jax.random.normal(KEY, (500, 2)) * 0.5 + jnp.array([1.0, -1.0])

    def model(data):
        t = flows.spline("flow", 2, count_bins=8, bound=5.0)
        base = dist.Normal(jnp.zeros(2), 1.0).to_event(1)
        flow_dist = TransformedDistribution(base, [t])
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", flow_dist, obs=data)

    def guide(data):
        flows.spline("flow", 2, count_bins=8, bound=5.0)

    svi = SVI(model, guide, Adam({"lr": 0.01}), Trace_ELBO())
    losses = [svi.step(target) for _ in range(500)]
    assert losses[-1] < losses[0] - 100


def test_auto_iaf_normal_guide():
    data = jnp.array([1.0, 2.0, 3.0])

    def model(data):
        a = pyro.sample("a", dist.Normal(0.0, 10.0))
        b = pyro.sample("b", dist.Normal(0.0, 10.0))
        with pyro.plate("data", 3):
            pyro.sample("obs", dist.Normal(a + b, 1.0), obs=data)

    guide = AutoIAFNormal(model)
    svi = SVI(model, guide, Adam({"lr": 0.01}), Trace_ELBO(num_particles=8))
    losses = [svi.step(data) for _ in range(1000)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-50:]) < np.mean(losses[:50])


def test_auto_normalizing_flow_forward_only():
    """AutoNormalizingFlow with a flow that has NO closed-form inverse
    (planar) trains: the guide scores its own sample through the
    with_cache (x, y) memo, as the reference's cache_size=1 flows do."""
    from pyro_tpu.distributions.transforms import iterated, planar
    from pyro_tpu.infer.autoguide import AutoNormalizingFlow

    data = jnp.array([1.0, 2.0, 3.0])

    def model(data):
        a = pyro.sample("a", dist.Normal(0.0, 10.0))
        b = pyro.sample("b", dist.Normal(0.0, 10.0))
        with pyro.plate("data", 3):
            pyro.sample("obs", dist.Normal(a + b, 1.0), obs=data)

    guide = AutoNormalizingFlow(
        model, lambda dim: iterated(2, planar, "anf_pl", dim)
    )
    svi = SVI(model, guide, Adam({"lr": 0.01}), Trace_ELBO(num_particles=8))
    losses = [svi.step(data) for _ in range(300)]
    assert np.isfinite(losses).all()
    assert np.mean(losses[-50:]) < np.mean(losses[:50])
