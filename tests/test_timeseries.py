"""contrib.timeseries tests (mirrors ``tests/contrib/timeseries``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
from pyro_tpu.contrib.timeseries import (
    GenericLGSSM,
    IndependentMaternGP,
    LinearlyCoupledMaternGP,
)

pytestmark = pytest.mark.stage("integration")


@pytest.fixture(autouse=True)
def _reset_names():
    from pyro_tpu.contrib.gp.parameterized import _COUNTERS

    _COUNTERS.clear()
    yield


def _train(model, targets, steps=150, lr=0.05):
    import optax

    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    def m(t):
        pyro.factor("ll", model.log_prob(t))

    def g(t):
        pass

    svi = SVI(m, g, Adam({"lr": lr}), Trace_ELBO())
    losses = [svi.step(targets) for _ in range(steps)]
    return losses


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
def test_matern_gp_logprob_and_train(nu):
    key = jax.random.key(0)
    T, D = 30, 2
    t = jnp.arange(T, dtype=jnp.float32)
    targets = jnp.stack(
        [jnp.sin(0.3 * t), jnp.cos(0.2 * t)], axis=-1
    ) + 0.1 * jax.random.normal(key, (T, D))
    gp = IndependentMaternGP(nu=nu, obs_dim=D)
    lp = gp.log_prob(targets)
    assert lp.shape == (D,)  # per-dim log probs, as upstream
    assert np.isfinite(np.asarray(lp)).all()
    losses = _train(gp, targets, steps=100)
    assert losses[-1] < losses[0]


def test_matern_gp_ssm_matches_kernel_covariance():
    """The SSM marginal prior covariance at lag d should equal the Matern
    kernel k(d) (nu=1.5)."""
    gp = IndependentMaternGP(nu=1.5, obs_dim=1)
    # increase obs noise ~0: compare prior covariance of observations
    from pyro_tpu.params.param_store import get_param_store

    store = get_param_store()
    store[f"{gp._pyro_name}.obs_noise_scale"] = jnp.array([1e-3])
    T = 6
    d = gp.get_dist(duration=T)
    key = jax.random.key(0)
    samples = d.rsample(key, (20000,))[..., 0]
    emp_cov = np.cov(np.asarray(samples).T)
    ls, ks = 1.0, 1.0
    import math

    lags = np.arange(T)
    lam = math.sqrt(3) / ls
    k_true = ks**2 * (1 + lam * lags) * np.exp(-lam * lags)
    emp_k = np.array([np.mean(np.diag(emp_cov, k)) for k in range(T)])
    assert np.allclose(emp_k, k_true, atol=0.08), (emp_k, k_true)


def test_matern_gp_forecast():
    T = 40
    t = jnp.arange(T, dtype=jnp.float32)
    targets = jnp.sin(0.2 * t)[:, None]
    gp = IndependentMaternGP(nu=1.5, obs_dim=1)
    _train(gp, targets, steps=200)
    pred = gp.forecast(targets, jnp.array([1.0]))
    # one-step-ahead forecast should be near the continuation
    expected = float(jnp.sin(0.2 * T))
    assert abs(float(pred.mean[0, 0]) - expected) < 0.5


def test_coupled_matern_gp():
    T = 20
    key = jax.random.key(1)
    z = jnp.sin(0.3 * jnp.arange(T, dtype=jnp.float32))
    targets = jnp.stack([z, 0.5 * z], -1) + 0.05 * jax.random.normal(key, (T, 2))
    gp = LinearlyCoupledMaternGP(nu=1.5, obs_dim=2, num_gps=1)
    assert np.isfinite(float(gp.log_prob(targets)))
    losses = _train(gp, targets, steps=100)
    assert losses[-1] < losses[0]


def test_generic_lgssm():
    T = 25
    key = jax.random.key(2)
    targets = jnp.cumsum(0.1 * jax.random.normal(key, (T, 1)), axis=0)
    m = GenericLGSSM(obs_dim=1, state_dim=2)
    assert np.isfinite(float(m.log_prob(targets)))
    losses = _train(m, targets, steps=100)
    assert losses[-1] < losses[0]
    fore = m.forecast(targets, 3)
    assert fore.batch_shape == (3,)


def test_dependent_matern_gp():
    """Correlated Wiener noise induces cross-output correlation; identity
    tril reduces to independent marginals; stationary covariance is PSD."""
    import pyro_tpu as pyro
    from pyro_tpu.contrib.timeseries import DependentMaternGP
    from pyro_tpu.distributions import constraints
    from pyro_tpu.distributions.transforms import biject_to

    pyro.clear_param_store()
    dg = DependentMaternGP(obs_dim=2, length_scale_init=jnp.asarray([1.5, 2.5]))
    S = np.asarray(dg._stationary_covariance())
    assert (np.linalg.eigvalsh(S) > -1e-6).all()
    y = jnp.asarray(np.random.RandomState(0).randn(20, 2), jnp.float32)
    assert np.isfinite(float(dg.log_prob(y)))

    store = pyro.get_param_store()
    k = [k for k in store.keys() if "wiener" in k][0]
    store._params[k] = biject_to(constraints.lower_cholesky).inv(
        jnp.asarray([[1.0, 0.0], [0.95, 0.31]])
    )
    x = dg.get_dist(duration=500).rsample(jax.random.key(0))
    corr = float(np.corrcoef(np.asarray(x).T)[0, 1])
    assert corr > 0.4, corr
    store._params[k] = biject_to(constraints.lower_cholesky).inv(jnp.eye(2))
    x2 = dg.get_dist(duration=500).rsample(jax.random.key(0))
    corr2 = float(np.corrcoef(np.asarray(x2).T)[0, 1])
    assert abs(corr2) < 0.25, corr2
