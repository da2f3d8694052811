"""Systematic sweep over the simple (non-flow) transform catalog.

Mirrors the reference ``tests/distributions/test_transforms.py``
(TransformTests + test_cholesky_transform/test_lower_cholesky_transform):
for every transform — round-trip inversion, analytic log-det vs an
autodiff Jacobian, and shape preservation across batch shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.distributions import transforms as T

KEY = jax.random.key(0)


def _randn(key, *shape):
    return jax.random.normal(jax.random.key(key), shape)


# ---------------------------------------------------------------------------
# scalar (event_dim 0) bijections: elementwise ladj == log|dy/dx|
# ---------------------------------------------------------------------------

SCALAR_CASES = [
    ("exp", T.ExpTransform(), lambda k: _randn(k, 5)),
    ("log", T.LogTransform(), lambda k: jnp.exp(_randn(k, 5))),
    ("sigmoid", T.SigmoidTransform(), lambda k: _randn(k, 5)),
    ("tanh", T.TanhTransform(), lambda k: 0.5 * _randn(k, 5)),
    ("softplus", T.SoftplusTransform(), lambda k: _randn(k, 5)),
    ("affine", T.AffineTransform(-3.0, 2.5), lambda k: _randn(k, 5)),
    ("power", T.PowerTransform(1.7), lambda k: jnp.exp(_randn(k, 5))),
    ("elu", T.ELUTransform(), lambda k: _randn(k, 5)),
    ("leaky_relu", T.LeakyReLUTransform(), lambda k: _randn(k, 5)),
    (
        "positive_power",
        T.PositivePowerTransform(3),
        lambda k: _randn(k, 5),
    ),
    (
        "cdf_normal",
        T.CumulativeDistributionTransform(dist.Normal(0.0, 1.0)),
        lambda k: _randn(k, 5),
    ),
    ("identity", T.IdentityTransform(), lambda k: _randn(k, 5)),
]


@pytest.mark.parametrize(
    "name,t,sampler", SCALAR_CASES, ids=[c[0] for c in SCALAR_CASES]
)
def test_scalar_transform(name, t, sampler):
    x = sampler(11)
    y = t(x)
    assert y.shape == x.shape
    x2 = t.inv(y)
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray(x), atol=1e-5, rtol=1e-5
    )
    ladj = t.log_abs_det_jacobian(x, y)
    dydx = jax.vmap(jax.grad(lambda v: t(v[None])[0]))(x)
    np.testing.assert_allclose(
        np.asarray(ladj),
        np.log(np.abs(np.asarray(dydx))),
        atol=1e-5,
        rtol=1e-5,
        err_msg=name,
    )
    # constraint membership
    assert bool(t.domain.check(x).all())
    assert bool(t.codomain.check(y).all())


# ---------------------------------------------------------------------------
# vector (event_dim 1) bijections R^n -> R^n: ladj == slogdet(jacobian)
# ---------------------------------------------------------------------------

N = 5

VECTOR_CASES = [
    ("ordered", T.OrderedTransform(), lambda k: _randn(k, N)),
    (
        "dct",
        T.DiscreteCosineTransform(),
        lambda k: _randn(k, N),
    ),
    (
        "dct_smooth",
        T.DiscreteCosineTransform(smooth=1.0),
        lambda k: _randn(k, N),
    ),
    (
        "haar",
        T.HaarTransform(),
        lambda k: _randn(k, 8),
    ),
    (
        "haar_flip",
        T.HaarTransform(flip=True),
        lambda k: _randn(k, 8),
    ),
    (
        "lower_cholesky_affine",
        T.LowerCholeskyAffine(
            _randn(3, N), jnp.tril(_randn(4, N, N)) + 3 * jnp.eye(N)
        ),
        lambda k: _randn(k, N),
    ),
]


@pytest.mark.parametrize(
    "name,t,sampler", VECTOR_CASES, ids=[c[0] for c in VECTOR_CASES]
)
def test_vector_transform(name, t, sampler):
    x = sampler(13)
    y = t(x)
    x2 = t.inv(y)
    np.testing.assert_allclose(
        np.asarray(x2), np.asarray(x), atol=1e-4, rtol=1e-4
    )
    ladj = t.log_abs_det_jacobian(x, y)
    assert jnp.shape(ladj) == ()
    J = jax.jacfwd(t.__call__)(x)
    expected = jnp.linalg.slogdet(J)[1]
    np.testing.assert_allclose(
        float(ladj), float(expected), atol=1e-4, err_msg=name
    )


@pytest.mark.parametrize("batch_shape", [(), (7,), (6, 5)])
def test_vector_transform_batched(batch_shape):
    """Batched inputs give per-batch ladj equal to the unbatched values."""
    t = T.OrderedTransform()
    x = _randn(17, *batch_shape, N)
    y = t(x)
    ladj = t.log_abs_det_jacobian(x, y)
    assert jnp.shape(ladj) == batch_shape
    np.testing.assert_allclose(
        np.asarray(t.inv(y)), np.asarray(x), atol=1e-5, rtol=1e-4
    )


def test_stickbreaking_transform():
    """R^n -> (n+1)-simplex; jacobian taken on the first n output coords
    (the free coordinates of the simplex)."""
    t = T.StickBreakingTransform()
    x = _randn(19, N)
    y = t(x)
    assert y.shape == (N + 1,)
    np.testing.assert_allclose(float(y.sum()), 1.0, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(t.inv(y)), np.asarray(x), atol=1e-5, rtol=1e-4
    )
    ladj = t.log_abs_det_jacobian(x, y)
    J = jax.jacfwd(lambda v: t(v)[:-1])(x)
    np.testing.assert_allclose(
        float(ladj), float(jnp.linalg.slogdet(J)[1]), atol=1e-4
    )


def test_simplex_to_ordered_transform():
    anchor = 0.7
    t = T.SimplexToOrderedTransform(anchor_point=jnp.asarray(anchor))
    x = jnp.asarray(
        jax.random.dirichlet(jax.random.key(5), jnp.ones(N + 1))
    )
    y = t(x)
    assert y.shape == (N,)
    assert bool((jnp.diff(y) > 0).all())
    np.testing.assert_allclose(
        np.asarray(t.inv(y)), np.asarray(x), atol=1e-5, rtol=1e-4
    )
    ladj = t.log_abs_det_jacobian(x, y)
    J = jax.jacfwd(lambda v: t(v))(x)[:, :-1]  # free simplex coords
    np.testing.assert_allclose(
        float(ladj), float(jnp.linalg.slogdet(J)[1]), atol=1e-4
    )


def test_normalize_pseudoinverse():
    """Normalize is non-bijective: check the pseudoinverse equation
    t(t.inv(y)) == y (ref _test_inverse weak branch)."""
    t = T.Normalize()
    assert not t.bijective
    x = _randn(23, 4, N)
    y = t(x)
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(y, axis=-1)), 1.0, atol=1e-6
    )
    y2 = t(t.inv(y))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_softmax_pseudoinverse():
    t = T.SoftmaxTransform()
    assert not t.bijective
    x = _randn(29, N)
    y = t(x)
    np.testing.assert_allclose(float(y.sum()), 1.0, atol=1e-6)
    y2 = t(t.inv(y))
    np.testing.assert_allclose(np.asarray(y2), np.asarray(y), atol=1e-6)


def test_abs_pseudoinverse():
    t = T.AbsTransform()
    assert not t.bijective
    y = jnp.abs(_randn(31, N))
    np.testing.assert_allclose(
        np.asarray(t(t.inv(y))), np.asarray(y), atol=1e-6
    )


# ---------------------------------------------------------------------------
# matrix transforms (ref test_cholesky_transform / lower_cholesky)
# ---------------------------------------------------------------------------


def _tril_mask(dim, diagonal=0):
    r = jnp.arange(dim)
    return r[None, :] <= r[:, None] + diagonal - 1 + 1 if diagonal == 0 else (
        r[None, :] < r[:, None]
    )


@pytest.mark.parametrize("batch_shape", [(), (7,)])
@pytest.mark.parametrize("dim", [2, 3, 5])
@pytest.mark.parametrize(
    "transform",
    [T.CholeskyTransform(), T.CorrMatrixCholeskyTransform()],
    ids=lambda t: type(t).__name__,
)
def test_cholesky_transform(batch_shape, dim, transform):
    z = _randn(37, *batch_shape, dim * (dim - 1) // 2)
    x = transform.inv(T.CorrCholeskyTransform()(z))  # corr matrix (also PD)
    y = transform(x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(jnp.linalg.cholesky(x)), atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(transform.inv(y)), np.asarray(x), atol=1e-5
    )
    log_det = transform.log_abs_det_jacobian(x, y)
    assert jnp.shape(log_det) == batch_shape

    if batch_shape == ():
        is_corr = type(transform).__name__ == "CorrMatrixCholeskyTransform"
        r = jnp.arange(dim)
        mask = (
            r[None, :] < r[:, None] if is_corr else r[None, :] <= r[:, None]
        )

        def vec_to_mat(x_vec):
            m = jnp.zeros((dim, dim)).at[mask].set(x_vec)
            m = (
                m
                + jnp.swapaxes(m, -1, -2)
                - jnp.diag(jnp.diagonal(m))
            )
            if is_corr:
                m = m + jnp.eye(dim)
            return m

        def t_vec(x_vec):
            return transform(vec_to_mat(x_vec))[mask]

        x_vec = x[mask]
        J = jax.jacfwd(t_vec)(x_vec)
        np.testing.assert_allclose(
            float(log_det), float(jnp.linalg.slogdet(J)[1]), atol=1e-4
        )


@pytest.mark.parametrize("batch_shape", [(), (7,)])
@pytest.mark.parametrize("dim", [2, 3, 5])
@pytest.mark.parametrize(
    "transform",
    [
        T.LowerCholeskyTransform(),
        T.SoftplusLowerCholeskyTransform(),
        T.UnitLowerCholeskyTransform(),
    ],
    ids=lambda t: type(t).__name__,
)
def test_lower_cholesky_transform(transform, batch_shape, dim):
    """Idempotent round trip on unconstrained matrices
    (ref test_transforms.py:490)."""
    x = _randn(41, *batch_shape, dim, dim)
    y = transform(x)
    assert y.shape == x.shape
    # lower triangular output
    np.testing.assert_allclose(
        np.asarray(jnp.triu(y, 1)), 0.0, atol=1e-6
    )
    x2 = transform.inv(y)
    y2 = transform(x2)
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("dim", [2, 3, 5])
def test_corr_cholesky_transform(dim):
    m = dim * (dim - 1) // 2
    t = T.CorrCholeskyTransform()
    z = _randn(43, m)
    y = t(z)
    # rows are unit-norm, lower triangular, positive diagonal
    np.testing.assert_allclose(
        np.asarray(jnp.linalg.norm(y, axis=-1)), 1.0, atol=1e-5
    )
    assert bool((jnp.diagonal(y) > 0).all())
    np.testing.assert_allclose(
        np.asarray(t.inv(y)), np.asarray(z), atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("dim", [2, 4])
def test_positive_definite_transform(dim):
    t = T.PositiveDefiniteTransform()
    x = _randn(47, dim, dim)
    y = t(x)
    evals = jnp.linalg.eigvalsh(y)
    assert bool((evals > 0).all())
    y2 = t(t.inv(y))
    np.testing.assert_allclose(
        np.asarray(y2), np.asarray(y), atol=1e-4, rtol=1e-4
    )


# ---------------------------------------------------------------------------
# structural transforms: Reshape / Cat / Stack / Compose / Independent
# ---------------------------------------------------------------------------


def test_reshape_transform():
    t = T.ReshapeTransform((2, 3), (3, 2))
    x = _randn(53, 4, 2, 3)
    y = t(x)
    assert y.shape == (4, 3, 2)
    np.testing.assert_allclose(np.asarray(t.inv(y)), np.asarray(x))
    ladj = t.log_abs_det_jacobian(x, y)
    np.testing.assert_allclose(np.asarray(ladj), 0.0)


def test_cat_transform():
    t = T.CatTransform(
        [T.ExpTransform(), T.AffineTransform(1.0, 2.0)], dim=-1, lengths=[2, 3]
    )
    x = _randn(59, 4, 5)
    y = t(x)
    np.testing.assert_allclose(
        np.asarray(y[..., :2]), np.asarray(jnp.exp(x[..., :2])), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(y[..., 2:]), np.asarray(1.0 + 2.0 * x[..., 2:]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(t.inv(y)), np.asarray(x), atol=1e-5, rtol=1e-5
    )


def test_stack_transform():
    t = T.StackTransform(
        [T.ExpTransform(), T.SigmoidTransform(), T.TanhTransform()], dim=-1
    )
    x = 0.5 * _randn(61, 4, 3)
    y = t(x)
    assert y.shape == x.shape
    np.testing.assert_allclose(
        np.asarray(t.inv(y)), np.asarray(x), atol=1e-5, rtol=1e-5
    )


def test_compose_transform_ladj():
    t = T.ComposeTransform(
        [T.AffineTransform(0.5, 3.0), T.ExpTransform(), T.LogTransform()]
    )
    x = _randn(67, 6)
    y = t(x)
    ladj = t.log_abs_det_jacobian(x, y)
    dydx = jax.vmap(jax.grad(lambda v: t(v[None])[0]))(x)
    np.testing.assert_allclose(
        np.asarray(ladj), np.log(np.abs(np.asarray(dydx))), atol=1e-5,
        rtol=1e-5,
    )


def test_independent_transform():
    t = T.IndependentTransform(T.ExpTransform(), 1)
    x = _randn(71, 4, N)
    y = t(x)
    ladj = t.log_abs_det_jacobian(x, y)
    assert ladj.shape == (4,)
    np.testing.assert_allclose(
        np.asarray(ladj), np.asarray(x.sum(-1)), rtol=1e-5
    )
