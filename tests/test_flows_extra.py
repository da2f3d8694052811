"""Tests for the completed transforms/flows catalog.

Every bijection is checked for (a) inverse consistency and (b) agreement
of ``log_abs_det_jacobian`` with the autodiff Jacobian determinant —
mirroring the reference's ``tests/distributions/test_transforms.py``
strategy.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
import pyro_tpu.distributions.transforms as T

D = 4


def _x(shape=(3, D), seed=0, scale=1.0):
    return scale * jax.random.normal(jax.random.key(seed), shape)


def _ladj_numeric(f, x1d):
    """log|det J| of f at a single (unbatched) input."""
    J = jax.jacfwd(f)(x1d)
    return jnp.log(jnp.abs(jnp.linalg.det(J)))


def _check_ladj(transform, x, atol=1e-4):
    y = transform(x)
    ladj = transform.log_abs_det_jacobian(x, y)
    for i in range(x.shape[0]):
        expected = _ladj_numeric(transform, x[i])
        np.testing.assert_allclose(
            np.asarray(ladj[i]), np.asarray(expected), atol=atol,
            rtol=1e-4,
        )


def _check_inverse(transform, x, atol=1e-4):
    y = transform(x)
    x2 = transform.inv(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=atol)


# -- forward-only learnable flows ------------------------------------------------


def test_sylvester():
    flow = T.sylvester("syl", D)
    x = _x()
    _check_ladj(flow, x)
    assert flow(x).shape == x.shape


@pytest.mark.parametrize("residual", [None, "normal", "gated"])
def test_block_autoregressive(residual):
    flow = T.block_autoregressive(
        f"bnaf_{residual}", D, hidden_factors=[3, 3], residual=residual
    )
    x = _x()
    _check_ladj(flow, x, atol=1e-3)


@pytest.mark.parametrize("activation", ["sigmoid", "ELU", "tanh"])
def test_neural_autoregressive(activation):
    flow = T.neural_autoregressive(
        f"naf_{activation}", D, activation=activation, width=8
    )
    x = _x(scale=0.5)
    _check_ladj(flow, x, atol=1e-3)


def test_polynomial():
    flow = T.polynomial("poly", D)
    x = _x(scale=0.5)
    y = flow(x)
    ladj = flow.log_abs_det_jacobian(x, y)
    # the jacobian is triangular; compare against its (eps-guarded, as in
    # the reference) diagonal since coefficients can be exactly 0 at init
    for i in range(x.shape[0]):
        diag = jnp.diagonal(jax.jacfwd(flow)(x[i]))
        expected = jnp.sum(jnp.log(diag + 1e-8))
        np.testing.assert_allclose(
            np.asarray(ladj[i]), np.asarray(expected), rtol=1e-3,
            atol=1e-3,
        )


# -- invertible learnable flows ---------------------------------------------------


def test_matrix_exponential():
    flow = T.matrix_exponential("mexp", D, iterations=12)
    x = _x()
    _check_inverse(flow, x, atol=1e-3)
    _check_ladj(flow, x, atol=1e-3)


def test_spline_autoregressive():
    flow = T.spline_autoregressive("sar", D, hidden_dims=[16])
    x = _x(scale=0.8)
    _check_inverse(flow, x, atol=2e-3)
    _check_ladj(flow, x, atol=1e-3)


def test_spline_coupling():
    flow = T.spline_coupling("scp", D, hidden_dims=[16])
    x = _x(scale=0.8)
    _check_inverse(flow, x, atol=2e-3)
    _check_ladj(flow, x, atol=1e-3)


def test_generalized_channel_permute():
    C, H, W = 3, 4, 4
    flow = T.generalized_channel_permute("gcp", channels=C)
    x = _x(shape=(2, C, H, W))
    y = flow(x)
    x2 = flow.inv(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-4)
    # ladj vs autodiff on flattened input
    ladj = flow.log_abs_det_jacobian(x, y)
    f_flat = lambda v: flow(v.reshape(C, H, W)).reshape(-1)
    expected = _ladj_numeric(f_flat, x[0].reshape(-1))
    np.testing.assert_allclose(
        np.asarray(ladj[0]), np.asarray(expected), rtol=1e-4, atol=1e-4
    )


def test_batchnorm_flow():
    flow = T.batchnorm("bn", D)
    x = _x()
    _check_inverse(flow, x)


# -- conditional flows ------------------------------------------------------------


@pytest.mark.parametrize(
    "factory,kwargs",
    [
        (T.conditional_affine_autoregressive, {}),
        (T.conditional_affine_coupling, {}),
        (T.conditional_householder, {}),
        (T.conditional_planar, {}),
        (T.conditional_radial, {}),
        (T.conditional_spline, {}),
        (T.conditional_spline_autoregressive, {}),
        (T.conditional_neural_autoregressive, {"width": 8}),
        (T.conditional_matrix_exponential, {}),
    ],
)
def test_conditional_flows_run(factory, kwargs):
    context_dim = 3
    name = factory.__name__
    cond = factory(name, D, context_dim, **kwargs)
    context = _x(shape=(3,), seed=5)
    flow = cond.condition(context)
    x = _x(scale=0.5)
    y = flow(x)
    assert y.shape == x.shape
    ladj = flow.log_abs_det_jacobian(x, y)
    assert ladj.shape == x.shape[:-1]
    assert bool(jnp.all(jnp.isfinite(y)))
    assert bool(jnp.all(jnp.isfinite(ladj)))


def test_conditional_generalized_channel_permute():
    C = 3
    cond = T.conditional_generalized_channel_permute("cgcp", 3, channels=C)
    flow = cond.condition(_x(shape=(3,), seed=7))
    x = _x(shape=(2, C, 4, 4))
    y = flow(x)
    x2 = flow.inv(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-3)


def test_conditional_transformed_distribution():
    from pyro_tpu.distributions.conditional import (
        ConditionalTransformedDistribution,
    )

    cond = T.conditional_affine_autoregressive("ctd_flow", D, 3)
    base = dist.Normal(jnp.zeros(D), jnp.ones(D)).to_event(1)
    ctd = ConditionalTransformedDistribution(base, [cond])
    d = ctd.condition(_x(shape=(3,), seed=9))
    s = d.sample(jax.random.key(0))
    assert s.shape == (D,)
    assert bool(jnp.isfinite(d.log_prob(s)))


# -- structural transforms ---------------------------------------------------------


@pytest.mark.parametrize(
    "transform,scale",
    [
        (T.ELUTransform(), 1.0),
        (T.LeakyReLUTransform(), 1.0),
        (T.PositivePowerTransform(3.0), 1.0),
    ],
)
def test_elementwise_bijections(transform, scale):
    x = _x(shape=(7,), scale=scale)
    y = transform(x)
    x2 = transform.inv(y)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x2), atol=1e-4)
    ladj = transform.log_abs_det_jacobian(x, y)
    expected = jnp.log(jnp.abs(jax.vmap(jax.grad(lambda v: transform(v)))(x)))
    np.testing.assert_allclose(
        np.asarray(ladj), np.asarray(expected), atol=1e-4
    )


@pytest.mark.parametrize("smooth", [0.0, 1.0])
def test_discrete_cosine(smooth):
    t = T.DiscreteCosineTransform(smooth=smooth)
    x = _x(shape=(3, 8))
    _check_inverse(t, x)
    np.testing.assert_allclose(
        np.asarray(t.log_abs_det_jacobian(x, t(x))), 0.0, atol=1e-4
    )
    if smooth == 0.0:
        expected = _ladj_numeric(t, x[0])
        np.testing.assert_allclose(np.asarray(expected), 0.0, atol=1e-3)


@pytest.mark.parametrize("flip", [False, True])
def test_haar(flip):
    t = T.HaarTransform(flip=flip)
    x = _x(shape=(3, 8))
    _check_inverse(t, x)
    expected = _ladj_numeric(t, x[0])
    np.testing.assert_allclose(np.asarray(expected), 0.0, atol=1e-3)


def test_lower_cholesky_affine():
    tril = jnp.tril(0.3 * _x(shape=(D, D), seed=3)) + 2.0 * jnp.eye(D)
    t = T.LowerCholeskyAffine(jnp.arange(float(D)), tril)
    x = _x()
    _check_inverse(t, x)
    _check_ladj(t, x)


def test_simplex_to_ordered():
    t = T.SimplexToOrderedTransform()
    p = jax.nn.softmax(_x(shape=(3, D)))
    y = t(p)
    assert y.shape == (3, D - 1)
    assert bool(jnp.all(y[..., 1:] >= y[..., :-1]))
    p2 = t.inv(y)
    np.testing.assert_allclose(np.asarray(p), np.asarray(p2), atol=1e-5)


def test_cumulative_distribution_transform():
    d = dist.Normal(0.0, 2.0)
    t = T.CumulativeDistributionTransform(d)
    x = _x(shape=(9,))
    y = t(x)
    assert bool(jnp.all((y > 0) & (y < 1)))
    np.testing.assert_allclose(
        np.asarray(t.inv(y)), np.asarray(x), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(t.log_abs_det_jacobian(x, y)),
        np.asarray(d.log_prob(x)),
    )


def test_reshape_transform():
    t = T.ReshapeTransform((2, 6), (3, 4))
    x = _x(shape=(5, 2, 6))
    y = t(x)
    assert y.shape == (5, 3, 4)
    np.testing.assert_allclose(np.asarray(t.inv(y)), np.asarray(x))
    assert t.forward_shape((7, 2, 6)) == (7, 3, 4)


def test_cat_stack_transforms():
    t = T.CatTransform(
        [T.ExpTransform(), T.IdentityTransform()], dim=-1, lengths=[2, 2]
    )
    x = _x()
    y = t(x)
    np.testing.assert_allclose(
        np.asarray(y[..., :2]), np.asarray(jnp.exp(x[..., :2])), rtol=1e-6
    )
    np.testing.assert_allclose(np.asarray(t.inv(y)), np.asarray(x), atol=1e-5)

    ts = T.StackTransform([T.ExpTransform(), T.TanhTransform()], dim=-1)
    x2 = _x(shape=(3, 2), scale=0.5)
    y2 = ts(x2)
    np.testing.assert_allclose(
        np.asarray(ts.inv(y2)), np.asarray(x2), atol=1e-5
    )


def test_normalize():
    t = T.Normalize()
    x = _x()
    y = t(x)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(y, axis=-1)), 1.0, rtol=1e-5
    )


def test_iterated():
    flow = T.iterated(3, T.planar, "it_planar", D)
    x = _x()
    y = flow(x)
    assert y.shape == x.shape
    assert len(list(flow)) == 3


def test_corr_l_cholesky_alias():
    t = T.CorrLCholeskyTransform()
    x = _x(shape=(D * (D - 1) // 2,), scale=0.3)
    L = t(x)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(L, axis=-1)), 1.0, rtol=1e-5
    )


def test_transformed_distribution_with_forward_only_flow():
    """TransformedDistribution can sample+score through a forward-only
    flow by scoring its own samples (x known)."""
    flow = T.sylvester("tdist_syl", D)
    base = dist.Normal(jnp.zeros(D), jnp.ones(D)).to_event(1)
    x = base.sample(jax.random.key(0))
    y = flow(x)
    lp = base.log_prob(x) - flow.log_abs_det_jacobian(x, y)
    assert bool(jnp.isfinite(lp))
