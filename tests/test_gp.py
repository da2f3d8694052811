"""GP tests (mirrors ``tests/contrib/gp``): exact regression matches
closed form; sparse/variational models train and predict sensibly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
from pyro_tpu.contrib import gp
from pyro_tpu.infer import SVI, Trace_ELBO, TraceMeanField_ELBO
from pyro_tpu.optim import Adam

pytestmark = pytest.mark.stage("integration")


@pytest.fixture
def data():
    key = jax.random.key(0)
    X = jnp.linspace(-3, 3, 25)[:, None]
    y = jnp.sin(X[:, 0]) + 0.1 * jax.random.normal(key, (25,))
    return X, y


def _closed_form_posterior(X, y, Xnew, variance, lengthscale, noise):
    Xs = np.asarray(X)[:, 0]
    Xn = np.asarray(Xnew)[:, 0]
    def k(a, b):
        return variance * np.exp(-0.5 * (a[:, None] - b[None, :]) ** 2 / lengthscale**2)
    Kff = k(Xs, Xs) + noise * np.eye(len(Xs))
    Kfs = k(Xs, Xn)
    Kss = k(Xn, Xn)
    A = np.linalg.solve(Kff, Kfs)
    mean = A.T @ np.asarray(y)
    cov = Kss - Kfs.T @ A
    return mean, np.diag(cov)


def test_gpr_matches_closed_form(data):
    X, y = data
    kernel = gp.kernels.RBF(1, variance=1.5, lengthscale=0.8)
    model = gp.GPRegression(X, y, kernel, noise=0.04)
    Xnew = jnp.linspace(-2, 2, 7)[:, None]
    loc, var = model(Xnew, full_cov=False)
    mean_cf, var_cf = _closed_form_posterior(X, y, Xnew, 1.5, 0.8, 0.04)
    assert np.allclose(np.asarray(loc), mean_cf, atol=1e-3)
    assert np.allclose(np.asarray(var), var_cf, atol=1e-3)


def test_gpr_training_improves_fit(data):
    X, y = data
    kernel = gp.kernels.RBF(1, variance=2.0, lengthscale=3.0)
    model = gp.GPRegression(X, y, kernel, noise=1.0)
    losses = gp.train(model, Adam({"lr": 0.05}), num_steps=300)
    assert losses[-1] < losses[0]
    # learned noise should shrink toward the true 0.01
    assert float(model.noise) < 0.2


def test_sgpr_approximations(data):
    X, y = data
    Xu = jnp.linspace(-3, 3, 10)[:, None]
    for approx in ("DTC", "FITC", "VFE"):
        pyro.clear_param_store()
        from pyro_tpu.contrib.gp.parameterized import _COUNTERS
        _COUNTERS.clear()
        kernel = gp.kernels.RBF(1)
        model = gp.SparseGPRegression(X, y, kernel, Xu, noise=0.5, approx=approx)
        losses = gp.train(model, Adam({"lr": 0.05}), num_steps=200)
        assert np.isfinite(losses).all()
        Xnew = jnp.linspace(-2, 2, 5)[:, None]
        loc, var = model(Xnew)
        # prediction should roughly follow sin
        assert np.abs(np.asarray(loc) - np.sin(np.asarray(Xnew)[:, 0])).mean() < 0.5
        assert (np.asarray(var) >= 0).all()


def test_vsgp_binary_classification():
    key = jax.random.key(1)
    X = jnp.linspace(-3, 3, 40)[:, None]
    f_true = jnp.sin(2 * X[:, 0])
    y = (jax.random.uniform(key, (40,)) < jax.nn.sigmoid(4 * f_true)).astype(jnp.float32)
    Xu = jnp.linspace(-3, 3, 8)[:, None]
    kernel = gp.kernels.RBF(1)
    lik = gp.likelihoods.Binary()
    model = gp.VariationalSparseGP(X, y, kernel, Xu, lik, whiten=True)
    losses = gp.train(model, Adam({"lr": 0.05}), num_steps=400)
    assert losses[-1] < losses[0]
    loc, _ = model(X)
    pred = jax.nn.sigmoid(loc) > 0.5
    acc = float((pred == (y > 0.5)).mean())
    assert acc > 0.8, acc


def test_kernel_algebra(data):
    X, _ = data
    k = gp.kernels.RBF(1) + gp.kernels.WhiteNoise(1, variance=0.1)
    K = k(X)
    assert K.shape == (25, 25)
    # PSD check
    eig = np.linalg.eigvalsh(np.asarray(K))
    assert eig.min() > 0
    k2 = gp.kernels.Matern52(1) * gp.kernels.Periodic(1)
    K2 = k2(X)
    assert np.isfinite(np.asarray(K2)).all()


@pytest.mark.parametrize(
    "kernel_cls",
    [
        gp.kernels.RBF,
        gp.kernels.Matern32,
        gp.kernels.Matern52,
        gp.kernels.Exponential,
        gp.kernels.RationalQuadratic,
        gp.kernels.Cosine,
    ],
)
def test_isotropic_kernels_psd(kernel_cls, data):
    X, _ = data
    k = kernel_cls(1)
    K = np.asarray(k(X))
    assert np.allclose(K, K.T, atol=1e-6)
    eig = np.linalg.eigvalsh(K + 1e-5 * np.eye(len(K)))
    assert eig.min() > 0
    d = np.asarray(k(X, diag=True))
    assert np.allclose(d, np.diag(K), atol=1e-6)
