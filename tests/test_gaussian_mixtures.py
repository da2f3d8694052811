"""Pathwise gradients for Gaussian mixture distributions.

Port of ``/root/reference/tests/distributions/test_gaussian_mixtures.py``:
the pathwise (custom-VJP) gradient of a Monte-Carlo quadratic cost matches
the analytic gradient for all three mixture families, and the estimator has
lower variance than the score-function estimator.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist

QUAD_N = 200_000


def _analytic_quadratic(params, family):
    """E[|z|^2] = sum_k pi_k (|loc_k|^2 + sum_i scale_ki^2)."""

    def f(params):
        pis = jax.nn.softmax(params["component_logits"])
        if family == "gsm":
            per = (
                params["coord_scale"] ** 2
            ).sum() * params["component_scale"] ** 2
            return (pis * per).sum()
        locs = params["locs"]
        cs = params["coord_scale"]
        if cs.ndim == 1:  # shared covariance
            per = (cs**2).sum() + (locs**2).sum(-1)
        else:
            per = (cs**2).sum(-1) + (locs**2).sum(-1)
        return (pis * per).sum()

    return f(params), jax.grad(f)(params)


@pytest.mark.parametrize("D", [2, 4, 5])
@pytest.mark.parametrize(
    "family", ["diag", "shared", "gsm"]
)
def test_mean_gradient_quadratic(family, D):
    K = 3
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    if family == "gsm":
        params = {
            "coord_scale": 1.0 + 0.5 * jax.random.uniform(k1, (D,)),
            "component_logits": 1.5 * jax.random.uniform(k2, (K,)),
            "component_scale": 1.5 + 0.5 * jax.random.uniform(k3, (K,)),
        }
        make = lambda p: dist.GaussianScaleMixture(**p)
    elif family == "shared":
        params = {
            "locs": jax.random.uniform(k1, (K, D)),
            "coord_scale": 1.0 + 0.5 * jax.random.uniform(k2, (D,)),
            "component_logits": 1.5 * jax.random.uniform(k3, (K,)),
        }
        make = lambda p: dist.MixtureOfDiagNormalsSharedCovariance(**p)
    else:
        params = {
            "locs": jax.random.uniform(k1, (K, D)),
            "coord_scale": 1.0 + 0.5 * jax.random.uniform(k2, (K, D)),
            "component_logits": 1.5 * jax.random.uniform(k3, (K,)),
        }
        make = lambda p: dist.MixtureOfDiagNormals(**p)

    analytic_cost, analytic_grads = _analytic_quadratic(params, family)

    def mc_cost(params):
        d = make(params)
        z = d.rsample(k4, (QUAD_N,))
        return (z**2).sum() / QUAD_N

    cost, grads = jax.jit(jax.value_and_grad(mc_cost))(params)
    np.testing.assert_allclose(
        float(cost), float(analytic_cost), atol=0.1, rtol=0.05
    )
    for name in params:
        np.testing.assert_allclose(
            np.asarray(grads[name]),
            np.asarray(analytic_grads[name]),
            atol=0.1,
            rtol=0.1,
            err_msg=f"{family}:{name}",
        )


def test_rsample_flag_and_shapes():
    K, D = 3, 4
    d = dist.MixtureOfDiagNormals(
        jnp.zeros((K, D)), jnp.ones((K, D)), jnp.zeros(K)
    )
    assert d.has_rsample
    z = d.rsample(jax.random.PRNGKey(0), (7,))
    assert z.shape == (7, D)
    assert np.isfinite(np.asarray(d.log_prob(z))).all()

    ds = dist.MixtureOfDiagNormalsSharedCovariance(
        jnp.zeros((K, D)), jnp.ones(D), jnp.zeros(K)
    )
    assert ds.has_rsample
    z = ds.rsample(jax.random.PRNGKey(1), (7,))
    assert z.shape == (7, D)
    assert np.isfinite(np.asarray(ds.log_prob(z))).all()

    g = dist.GaussianScaleMixture(jnp.ones(D), jnp.zeros(K), jnp.ones(K))
    assert g.has_rsample
    z = g.rsample(jax.random.PRNGKey(2), (7,))
    assert z.shape == (7, D)
    assert np.isfinite(np.asarray(g.log_prob(z))).all()


def test_batched_mixture_rsample_grad():
    """Batched (B x K x D) parameters: gradient shapes and finiteness."""
    B, K, D = 5, 3, 4
    key = jax.random.PRNGKey(3)
    locs = jax.random.normal(key, (B, K, D))
    coord_scale = 1.0 + 0.5 * jax.random.uniform(key, (B, K, D))
    logits = jax.random.normal(key, (B, K))

    def cost(locs, coord_scale, logits):
        d = dist.MixtureOfDiagNormals(locs, coord_scale, logits)
        z = d.rsample(jax.random.PRNGKey(4), (11,))
        assert z.shape == (11, B, D)
        return (z**2).mean()

    grads = jax.grad(cost, argnums=(0, 1, 2))(locs, coord_scale, logits)
    assert grads[0].shape == locs.shape
    assert grads[1].shape == coord_scale.shape
    assert grads[2].shape == logits.shape
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()


def test_pathwise_beats_score_function_variance():
    """The pathwise estimator's gradient variance is lower than the
    score-function estimator's on the same cost (the reason these
    distributions exist; ref arXiv:1806.01856)."""
    K, D = 3, 4
    key = jax.random.PRNGKey(0)
    locs = jax.random.normal(key, (K, D))
    coord_scale = 1.0 + 0.5 * jax.random.uniform(key, (K, D))
    logits = jax.random.normal(key, (K,))
    n = 64  # per-estimate sample count
    trials = 64

    def pathwise_grad(k):
        def cost(locs):
            d = dist.MixtureOfDiagNormals(locs, coord_scale, logits)
            z = d.rsample(k, (n,))
            return (z**2).sum() / n

        return jax.grad(cost)(locs)

    def score_fn_grad(k):
        def cost(locs):
            d = dist.MixtureOfDiagNormals(locs, coord_scale, logits)
            z = jax.lax.stop_gradient(d.rsample(k, (n,)))
            f = (z**2).sum(-1)
            return (d.log_prob(z) * f).sum() / n

        return jax.grad(cost)(locs)

    keys = jax.random.split(jax.random.PRNGKey(7), trials)
    pw = jax.vmap(pathwise_grad)(keys)
    sf = jax.vmap(score_fn_grad)(keys)
    var_pw = float(jnp.var(pw, axis=0).mean())
    var_sf = float(jnp.var(sf, axis=0).mean())
    assert var_pw < var_sf, (var_pw, var_sf)
