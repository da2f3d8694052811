"""OMT / AVF multivariate-normal gradient estimators.

Port of ``/root/reference/tests/distributions/test_omt_mvn.py``: the
Cholesky-factor gradient of E[cos(omega . z)] matches the analytic value,
the gradient is lower-triangular, and log_prob agrees with the plain MVN.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist


def analytic_grad(L11=1.0, L22=1.0, L21=1.0, omega1=1.0, omega2=1.0):
    dp = L11 * omega1 + L21 * omega2
    fact_1 = -omega2 * dp
    fact_2 = np.exp(-0.5 * (L22 * omega2) ** 2)
    fact_3 = np.exp(-0.5 * dp**2)
    return fact_1 * fact_2 * fact_3


@pytest.mark.parametrize("L21", [0.4, 1.1])
@pytest.mark.parametrize("mvn_dist", ["omt", "avf"])
def test_mean_gradient(mvn_dist, L21, L11=0.6, L22=0.8, L33=0.9,
                       omega1=0.5, omega2=0.75):
    omega = jnp.array([omega1, omega2, 0.0])
    loc = jnp.zeros(3)
    off_diag = jnp.array(
        [[0.0, 0.0, 0.0], [L21, 0.0, 0.0], [0.0, 0.0, 0.0]]
    )
    diag = jnp.diag(jnp.array([L11, L22, L33]))
    n = 200_000
    key = jax.random.PRNGKey(0)
    cv = 1.1 * jax.random.uniform(jax.random.PRNGKey(1), (2, 1, 3))

    def cost(loc, off_diag):
        L = diag + off_diag
        if mvn_dist == "omt":
            d = dist.OMTMultivariateNormal(loc, L)
        else:
            d = dist.AVFMultivariateNormal(loc, L, cv)
        z = d.rsample(key, (n,))
        return jnp.cos((omega * z).sum(-1)).mean()

    g_loc, g_off = jax.jit(jax.grad(cost, argnums=(0, 1)))(loc, off_diag)
    assert g_off.shape == off_diag.shape
    assert g_loc.shape == loc.shape
    # gradient of a Cholesky factor is lower-triangular
    assert float(jnp.abs(jnp.triu(g_off, 1)).sum()) == 0.0
    expected = analytic_grad(
        L11=L11, L22=L22, L21=L21, omega1=omega1, omega2=omega2
    )
    np.testing.assert_allclose(
        float(g_off[1, 0]), expected, atol=0.005, err_msg=mvn_dist
    )


def test_omt_matches_reparam_expectation():
    """OMT and standard-reparam gradients estimate the SAME expectation."""
    key = jax.random.PRNGKey(2)
    loc = jnp.array([0.3, -0.2, 0.5])
    L = jnp.array([[0.9, 0.0, 0.0], [0.4, 0.7, 0.0], [-0.2, 0.1, 0.8]])
    n = 200_000

    def cost_omt(L):
        d = dist.OMTMultivariateNormal(loc, L)
        return (d.rsample(key, (n,)) ** 2).sum(-1).mean()

    def cost_std(L):
        d = dist.MultivariateNormal(loc, scale_tril=L)
        return (d.rsample(key, (n,)) ** 2).sum(-1).mean()

    g_omt = jax.grad(cost_omt)(L)
    g_std = jax.grad(cost_std)(L)
    # analytic: d/dL of tr(L L^T) = 2 L
    np.testing.assert_allclose(np.asarray(g_omt), 2 * np.asarray(L), atol=0.05)
    np.testing.assert_allclose(np.asarray(g_std), 2 * np.asarray(L), atol=0.05)


@pytest.mark.parametrize("mvn_dist", ["omt", "avf"])
def test_log_prob(mvn_dist):
    """Ref test_omt_mvn.py::test_log_prob — density equals the plain MVN."""
    loc = jnp.array([2.0, 1.0, 1.0, 2.0, 2.0])
    D = jnp.array([1.0, 2.0, 3.0, 1.0, 3.0])
    W = jnp.array([[1.0, -1.0, 2.0, 2.0, 4.0], [2.0, 1.0, 1.0, 2.0, 6.0]])
    x = jnp.array([2.0, 3.0, 4.0, 1.0, 7.0])
    L = jnp.diag(D) + jnp.tril(W.T @ W)
    if mvn_dist == "omt":
        d = dist.OMTMultivariateNormal(loc, L)
    else:
        d = dist.AVFMultivariateNormal(
            loc, L, 0.1 * jnp.ones((2, 1, 5))
        )
    ref = dist.MultivariateNormal(loc, scale_tril=L)
    np.testing.assert_allclose(
        float(d.log_prob(x)), float(ref.log_prob(x)), rtol=1e-6
    )


def test_avf_control_var_receives_grad():
    loc = jnp.zeros(3)
    L = jnp.eye(3)
    cv = 0.2 * jnp.ones((2, 2, 3))

    def cost(cv):
        d = dist.AVFMultivariateNormal(loc, L, cv)
        z = d.rsample(jax.random.PRNGKey(0), (512,))
        return (z**2).sum(-1).mean()

    g = jax.grad(cost)(cv)
    assert g.shape == cv.shape
    assert np.isfinite(np.asarray(g)).all()


def test_omt_vjp_composes_with_vmap_over_batched_L():
    # the distribution classes keep the reference's unbatched-L
    # restriction (omt_mvn.py:30-34); the documented route for a batch
    # of factors is vmapping the estimator itself
    from pyro_tpu.distributions.mvn_gradients import avf_mvn_sample, omt_mvn_sample

    D, B = 3, 4
    ks = jax.random.split(jax.random.key(0), 4)
    locs = jax.random.normal(ks[0], (B, D))
    Ls = jnp.tril(jax.random.normal(ks[1], (B, D, D))) + 2 * jnp.eye(D)
    white = jax.random.normal(ks[2], (B, D))

    def loss_batched(locs, Ls):
        z = jax.vmap(omt_mvn_sample)(locs, Ls, white)
        return jnp.sum(jnp.sin(z) * z**2)

    g_loc, g_L = jax.grad(loss_batched, argnums=(0, 1))(locs, Ls)

    def loss_i(loc, L, w):
        z = omt_mvn_sample(loc, L, w)
        return jnp.sum(jnp.sin(z) * z**2)

    for i in range(B):
        gi_loc, gi_L = jax.grad(loss_i, argnums=(0, 1))(locs[i], Ls[i], white[i])
        np.testing.assert_allclose(g_loc[i], gi_loc, rtol=1e-3, atol=1e-4)
        np.testing.assert_allclose(g_L[i], gi_L, rtol=1e-3, atol=1e-4)

    # AVF: vmapped estimator produces finite adaptation grads per factor
    cv = 0.1 * jax.random.normal(ks[3], (B, 2, 2, D))

    def loss_avf(locs, Ls, cv):
        z = jax.vmap(avf_mvn_sample)(locs, Ls, cv, white)
        return jnp.sum(z**3)

    ga = jax.grad(loss_avf, argnums=(0, 1, 2))(locs, Ls, cv)
    assert ga[1].shape == (B, D, D) and ga[2].shape == (B, 2, 2, D)
    for g in ga:
        assert np.isfinite(np.asarray(g)).all()


def test_expanded_batched_loc_gradients():
    """expand() keeps the single 2-D factor and broadcasts loc; gradients
    through rsample must unbroadcast the loc grad to the stored shape
    (regression: round-5 unit tier caught expand() rejecting batched loc)."""
    import pyro_tpu.distributions as dist

    D, B = 3, 4
    ks = jax.random.split(jax.random.key(7), 3)
    loc = jax.random.normal(ks[0], (D,))
    L = jnp.tril(jax.random.normal(ks[1], (D, D))) + 2 * jnp.eye(D)

    d = dist.OMTMultivariateNormal(loc, L).expand((B,))
    assert d.batch_shape == (B,)
    z = d.rsample(ks[2])
    assert z.shape == (B, D)
    assert np.isfinite(np.asarray(d.log_prob(z))).all()

    def loss(loc, L):
        dd = dist.OMTMultivariateNormal(loc, L).expand((B,))
        return jnp.sum(dd.rsample(ks[2]) ** 2)

    g_loc, g_L = jax.grad(loss, argnums=(0, 1))(loc, L)
    assert g_loc.shape == (D,) and g_L.shape == (D, D)
    assert np.isfinite(np.asarray(g_loc)).all()
    assert np.isfinite(np.asarray(g_L)).all()

    cv = 0.1 * jax.random.normal(ks[2], (2, 2, D))
    da = dist.AVFMultivariateNormal(loc, L, cv).expand((B,))
    za = da.rsample(ks[2])
    assert za.shape == (B, D)

    def loss_avf(loc, L, cv):
        dd = dist.AVFMultivariateNormal(loc, L, cv).expand((B,))
        return jnp.sum(dd.rsample(ks[2]) ** 2)

    ga = jax.grad(loss_avf, argnums=(0, 1, 2))(loc, L, cv)
    assert ga[0].shape == (D,) and ga[1].shape == (D, D)
    assert ga[2].shape == (2, 2, D)
    for g in ga:
        assert np.isfinite(np.asarray(g)).all()
