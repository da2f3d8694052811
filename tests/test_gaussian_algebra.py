"""Gaussian information-form algebra identities (ports the core of the
reference's ``tests/ops/test_gaussian.py``): marginalize == integrate,
condition == joint/marginal density ratio, tensordot == pair
integration, and mvn round-trips — across batch shapes.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.ops.gaussian import (
    gaussian_tensordot,
    matrix_and_mvn_to_gaussian,
    mvn_to_gaussian,
)


def random_gaussian(key, batch_shape, dim):
    k1, k2, k3 = jax.random.split(key, 3)
    loc = jax.random.normal(k1, batch_shape + (dim,))
    A = jax.random.normal(k2, batch_shape + (dim, dim + 2)) / (dim + 2) ** 0.5
    cov = A @ jnp.swapaxes(A, -1, -2) + 0.3 * jnp.eye(dim)
    mvn = dist.MultivariateNormal(loc, covariance_matrix=cov)
    return mvn_to_gaussian(mvn), mvn


@pytest.mark.parametrize("batch_shape", [(), (4,), (3, 2)], ids=str)
@pytest.mark.parametrize("dim", [1, 2, 3])
def test_mvn_to_gaussian_log_prob(batch_shape, dim):
    g, mvn = random_gaussian(jax.random.key(0), batch_shape, dim)
    x = jax.random.normal(jax.random.key(1), batch_shape + (dim,))
    np.testing.assert_allclose(
        np.asarray(g.log_density(x)),
        np.asarray(mvn.log_prob(x)),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.parametrize("left,right", [(1, 2), (2, 1), (2, 2)])
@pytest.mark.parametrize("batch_shape", [(), (3,)], ids=str)
def test_marginalize_is_integration(batch_shape, left, right):
    dim = left + right
    g, mvn = random_gaussian(jax.random.key(2), batch_shape, dim)
    # marginalizing the LEFT block leaves the MVN marginal over the rest
    marg = g.marginalize(left=left)
    sub_loc = mvn.loc[..., left:]
    sub_cov = mvn.covariance_matrix[..., left:, left:]
    sub = dist.MultivariateNormal(sub_loc, covariance_matrix=sub_cov)
    x = jax.random.normal(jax.random.key(3), batch_shape + (right,))
    np.testing.assert_allclose(
        np.asarray(marg.log_density(x)),
        np.asarray(sub.log_prob(x)),
        rtol=1e-4,
        atol=1e-3,
    )
    # total mass is preserved
    np.testing.assert_allclose(
        np.asarray(marg.event_logsumexp()),
        np.asarray(g.event_logsumexp()),
        rtol=1e-4,
        atol=1e-3,
    )


@pytest.mark.parametrize("left,right", [(1, 1), (2, 1), (1, 2)])
def test_condition_is_density_ratio(left, right):
    dim = left + right
    g, mvn = random_gaussian(jax.random.key(4), (), dim)
    x = jax.random.normal(jax.random.key(5), (left,))
    y = jax.random.normal(jax.random.key(6), (right,))
    xy = jnp.concatenate([x, y])
    # condition on the RIGHT block: g.condition(y) is a Gaussian over x
    # with log density log p(x, y) (unnormalized)
    cond = g.condition(y)
    np.testing.assert_allclose(
        float(cond.log_density(x)),
        float(g.log_density(xy)),
        rtol=1e-4,
        atol=1e-4,
    )


@pytest.mark.parametrize("x_dim,y_dim,dot", [(1, 2, 1), (2, 1, 1), (2, 2, 2)])
def test_gaussian_tensordot_is_integration(x_dim, y_dim, dot):
    """int dz f(x, z) g(z, y) equals the tensordot over the shared
    block (checked at a point through quadrature-free identity:
    tensordot log-density == logsumexp over a fine grid)."""
    gx, _ = random_gaussian(jax.random.key(7), (), x_dim + dot)
    gy, _ = random_gaussian(jax.random.key(8), (), dot + y_dim)
    joint = gaussian_tensordot(gx, gy, dims=dot)
    assert joint.dim == x_dim + y_dim

    x = jax.random.normal(jax.random.key(9), (x_dim,))
    y = jax.random.normal(jax.random.key(10), (y_dim,))
    # numeric integration over the shared z block on a grid
    grid = jnp.linspace(-8.0, 8.0, 2001)
    if dot == 1:
        zs = grid[:, None]
    else:
        zs = jnp.stack(
            jnp.meshgrid(
                jnp.linspace(-6.0, 6.0, 201),
                jnp.linspace(-6.0, 6.0, 201),
            ),
            axis=-1,
        ).reshape(-1, 2)
    fx = jax.vmap(
        lambda z: gx.log_density(jnp.concatenate([x, z]))
    )(zs)
    fy = jax.vmap(
        lambda z: gy.log_density(jnp.concatenate([z, y]))
    )(zs)
    cell = (
        (grid[1] - grid[0])
        if dot == 1
        else (12.0 / 200) ** 2
    )
    expected = jax.scipy.special.logsumexp(fx + fy) + jnp.log(cell)
    actual = joint.log_density(jnp.concatenate([x, y]))
    np.testing.assert_allclose(float(actual), float(expected), atol=0.01)


@pytest.mark.parametrize("x_dim,y_dim", [(1, 1), (2, 1), (1, 3)])
def test_matrix_and_mvn_to_gaussian(x_dim, y_dim):
    """The affine-normal Gaussian scores p(y | x) = N(x @ M, cov)."""
    k = jax.random.split(jax.random.key(11), 4)
    M = jax.random.normal(k[0], (x_dim, y_dim))
    loc = jax.random.normal(k[1], (y_dim,))
    A = jax.random.normal(k[2], (y_dim, y_dim + 2)) / (y_dim + 2) ** 0.5
    cov = A @ A.T + 0.2 * jnp.eye(y_dim)
    mvn = dist.MultivariateNormal(loc, covariance_matrix=cov)
    g = matrix_and_mvn_to_gaussian(M, mvn)
    assert g.dim == x_dim + y_dim
    x = jax.random.normal(k[3], (x_dim,))
    y = jax.random.normal(jax.random.key(12), (y_dim,))
    expected = dist.MultivariateNormal(
        x @ M + loc, covariance_matrix=cov
    ).log_prob(y)
    np.testing.assert_allclose(
        float(g.log_density(jnp.concatenate([x, y]))),
        float(expected),
        rtol=1e-4,
        atol=1e-4,
    )


def test_precision_scales_with_dtype():
    """The f64 axis (PYRO_TPU_X64=1) must buy real precision: the
    marginalization identity holds to ~1e-9 in double where f32 only
    reaches ~1e-4 (ref tests/conftest.py:12-14 dtype axis)."""
    import os

    x64 = os.environ.get("PYRO_TPU_X64") == "1"
    rtol, atol = (1e-9, 1e-9) if x64 else (1e-4, 1e-3)
    g, mvn = random_gaussian(jax.random.key(11), (), 5)
    marg = g.marginalize(left=2)
    sub = dist.MultivariateNormal(
        mvn.loc[..., 2:], covariance_matrix=mvn.covariance_matrix[..., 2:, 2:]
    )
    x = jax.random.normal(jax.random.key(12), (7, 3))
    if x64:
        x = x.astype(jnp.float64)
    np.testing.assert_allclose(
        np.asarray(marg.log_density(x)),
        np.asarray(sub.log_prob(x)),
        rtol=rtol,
        atol=atol,
    )
