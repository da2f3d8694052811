"""GP kernel forward values (ports the reference's
``tests/contrib/gp/test_kernels.py`` fixture table: exact K.sum() values
for every kernel family, plus combination/transform algebra).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pyro_tpu.contrib.gp.kernels import (
    RBF,
    Brownian,
    Constant,
    Coregionalize,
    Cosine,
    Exponent,
    Exponential,
    Linear,
    Matern32,
    Matern52,
    Periodic,
    Polynomial,
    Product,
    RationalQuadratic,
    Sum,
    VerticalScaling,
    Warping,
    WhiteNoise,
)

variance = jnp.asarray([3.0])
lengthscale = jnp.asarray([2.0, 1.0, 2.0])
X = jnp.asarray([[1.0, 0.0, 1.0], [2.0, 1.0, 3.0]])
Z = jnp.asarray([[4.0, 5.0, 6.0], [3.0, 1.0, 7.0], [3.0, 1.0, 2.0]])

CASES = [
    ("Constant", lambda: Constant(3, variance), X, Z, 18),
    ("Brownian", lambda: Brownian(1, variance), X[:, 0], Z[:, 0], 27),
    ("Cosine", lambda: Cosine(3, variance, lengthscale), X, Z, -0.193233),
    ("Linear", lambda: Linear(3, variance), X, Z, 291),
    (
        "Exponential",
        lambda: Exponential(3, variance, lengthscale),
        X, Z, 2.685679,
    ),
    ("Matern32", lambda: Matern32(3, variance, lengthscale), X, Z, 3.229314),
    ("Matern52", lambda: Matern52(3, variance, lengthscale), X, Z, 3.391847),
    (
        "Periodic",
        lambda: Periodic(3, variance, lengthscale, period=jnp.ones(1)),
        X, Z, 18,
    ),
    ("Polynomial", lambda: Polynomial(3, variance, degree=2), X, Z, 7017),
    (
        "RationalQuadratic",
        lambda: RationalQuadratic(
            3, variance, lengthscale, scale_mixture=jnp.ones(1)
        ),
        X, Z, 5.684670,
    ),
    ("RBF", lambda: RBF(3, variance, lengthscale), X, Z, 3.681117),
    ("WhiteNoiseXZ", lambda: WhiteNoise(3, variance, lengthscale), X, Z, 0),
    ("WhiteNoiseXX", lambda: WhiteNoise(3, variance, lengthscale), X, None, 6),
    (
        "Coregionalize",
        lambda: Coregionalize(3, components=jnp.eye(3, 3)),
        jnp.asarray([[1.0, 0.0, 0.0], [0.5, 0.0, 0.5]]),
        jnp.asarray([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
        2.25,
    ),
]


@pytest.mark.parametrize(
    "name,make,x,z,k_sum", CASES, ids=[c[0] for c in CASES]
)
def test_kernel_forward(name, make, x, z, k_sum):
    kernel = make()
    K = kernel(x, z)
    n = x.shape[0]
    m = (x if z is None else z).shape[0]
    assert K.shape == (n, m)
    np.testing.assert_allclose(float(K.sum()), k_sum, rtol=1e-5, atol=1e-5)
    # symmetry + PSD-diagonal sanity on K(X, X)
    Kxx = kernel(x)
    np.testing.assert_allclose(
        np.asarray(Kxx), np.asarray(Kxx).T, rtol=1e-5, atol=1e-6
    )


def test_combination_algebra():
    """(ref test_kernels.py:107) sums/products distribute elementwise."""
    k0 = RBF(3, variance, lengthscale)
    k1 = Linear(3, variance)
    k2 = Constant(3, variance)
    K0, K1, K2 = k0(X, Z), k1(X, Z), k2(X, Z)
    np.testing.assert_allclose(
        np.asarray(Sum(k0, k1)(X, Z)), np.asarray(K0 + K1), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(Product(k0, k2)(X, Z)), np.asarray(K0 * K2), rtol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(Sum(Product(k0, k1), k2)(X, Z)),
        np.asarray(K0 * K1 + K2),
        rtol=1e-5,
    )


def test_transforming_kernels():
    """(ref test_kernels.py:133) Exponent/VerticalScaling/Warping."""
    k = RBF(3, variance, lengthscale)
    K = k(X, Z)
    np.testing.assert_allclose(
        np.asarray(Exponent(k)(X, Z)), np.asarray(jnp.exp(K)), rtol=1e-5
    )
    vscale = lambda x: x[..., 0]  # noqa: E731
    np.testing.assert_allclose(
        np.asarray(VerticalScaling(k, vscaling_fn=vscale)(X, Z)),
        np.asarray(vscale(X)[:, None] * K * vscale(Z)[None, :]),
        rtol=1e-5,
    )
    warp = lambda x: 2.0 * x  # noqa: E731
    np.testing.assert_allclose(
        np.asarray(Warping(k, iwarping_fn=warp)(X, Z)),
        np.asarray(k(warp(X), warp(Z))),
        rtol=1e-5,
    )


def test_gpr_closed_form_posterior():
    """GPRegression predictive mean/cov equals the closed-form GP
    conditional k(X*,X)(K+sigma^2 I)^-1 ... (ref tests/contrib/gp)."""
    import pyro_tpu as pyro
    from pyro_tpu.contrib import gp

    pyro.clear_param_store()
    key = __import__("jax").random.key(0)
    import jax

    Xtr = jnp.linspace(-2.0, 2.0, 12)[:, None]
    ytr = jnp.sin(Xtr[:, 0]) + 0.05 * jax.random.normal(key, (12,))
    Xte = jnp.linspace(-1.5, 1.5, 5)[:, None]
    noise = 0.04

    kernel = gp.kernels.RBF(
        1, variance=jnp.asarray([1.3]), lengthscale=jnp.asarray([0.7])
    )
    model = gp.models.GPRegression(Xtr, ytr, kernel, noise=jnp.asarray(noise))
    mean, cov = model(Xte, full_cov=True)

    Kxx = kernel(Xtr) + noise * jnp.eye(12)
    Ksx = kernel(Xte, Xtr)
    Kss = kernel(Xte)
    sol = jnp.linalg.solve(Kxx, np.asarray(ytr))
    expected_mean = Ksx @ sol
    expected_cov = Kss - Ksx @ jnp.linalg.solve(Kxx, Ksx.T)
    np.testing.assert_allclose(
        np.asarray(mean), np.asarray(expected_mean), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(cov), np.asarray(expected_cov), rtol=1e-3, atol=1e-4
    )
