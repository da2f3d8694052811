"""ops.stats value-level tests (ports the reference's
``tests/ops/test_stats.py``): exact quantile/weighed-quantile fixtures,
pi/hpdi agreement, WAIC against the R ``loo`` package's reference
values, and diagnostics shape/behavior checks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyro_tpu.ops.stats import (
    autocorrelation,
    autocovariance,
    effective_sample_size,
    gelman_rubin,
    hpdi,
    pi,
    quantile,
    resample,
    split_gelman_rubin,
    waic,
    weighed_quantile,
)


def test_quantile():
    x = jnp.asarray([0.0, 1.0, 2.0])
    np.testing.assert_allclose(
        np.asarray(quantile(x, probs=[0.0, 0.4, 0.5, 1.0])),
        [0.0, 0.8, 1.0, 2.0],
        atol=1e-6,
    )
    y = jax.random.uniform(jax.random.key(0), (2000,))
    np.testing.assert_allclose(float(quantile(y, probs=0.2)), 0.2, atol=0.02)
    z = jax.random.normal(jax.random.key(1), (2000,))
    np.testing.assert_allclose(
        float(quantile(z, probs=0.8413)), 1.0, atol=0.06
    )


def test_weighed_quantile():
    """Fixed-value fixture from the reference (test_stats.py:63)."""
    x = jnp.asarray([[10.0, 50.0, 40.0], [20.0, 30.0, 0.0]])
    probs = [0.2, 0.8]
    log_weights = jnp.log(jnp.asarray([0.4, 0.5, 0.1]))
    result = weighed_quantile(x, probs, log_weights, -1)
    np.testing.assert_allclose(
        np.asarray(result), [[40.4, 47.6], [9.0, 26.4]], atol=1e-4
    )


def test_pi_matches_quantile():
    x = jnp.exp(jax.random.normal(jax.random.key(2), (1000,)))
    np.testing.assert_allclose(
        np.asarray(pi(x, prob=0.8)),
        np.asarray(quantile(x, probs=[0.1, 0.9])),
        rtol=1e-5,
    )


def test_hpdi():
    x = jax.random.normal(jax.random.key(3), (20000,))
    np.testing.assert_allclose(
        np.asarray(hpdi(x, prob=0.8)),
        np.asarray(pi(x, prob=0.8)),
        atol=0.05,
    )
    e = jax.random.exponential(jax.random.key(4), (20000,))
    np.testing.assert_allclose(
        np.asarray(hpdi(e, prob=0.2)), [0.0, 0.22], atol=0.02
    )


def test_waic_against_loo_package():
    """Reference values from mc-stan.org/loo (test_stats.py:256)."""
    x = -jnp.log(jnp.arange(1.0, 101)).reshape(25, 4)
    w_pw, p_pw = waic(x, pointwise=True)
    w, p = waic(x)
    w1, p1 = waic(x.T, dim=1)
    np.testing.assert_allclose(
        np.asarray(w_pw), [7.49, 7.75, 7.86, 7.92], atol=0.01
    )
    np.testing.assert_allclose(
        np.asarray(p_pw), [1.14, 0.91, 0.79, 0.70], atol=0.01
    )
    np.testing.assert_allclose(float(w), float(np.sum(np.asarray(w_pw))), rtol=1e-6)
    np.testing.assert_allclose(float(w), float(w1), rtol=1e-6)
    np.testing.assert_allclose(float(p), float(p1), rtol=1e-6)


def test_weighted_waic():
    k = jax.random.split(jax.random.key(5), 3)
    a = 1 + jax.random.uniform(k[0], (10,))
    b = 1 + jax.random.uniform(k[1], (10,))
    c = 1 + jax.random.uniform(k[2], (10,))
    expanded_x = jnp.log(jnp.stack([a, b, c, a, b, a, c, a, c]))
    x = jnp.log(jnp.stack([a, b, c]))
    log_weights = jnp.log(jnp.asarray([4.0, 2.0, 3.0])) - 0.37
    w1, p1 = waic(x, log_weights)
    w2, p2 = waic(expanded_x)
    lpd1 = -0.5 * w1 + p1
    lpd2 = -0.5 * w2 + p2
    np.testing.assert_allclose(float(lpd1), float(lpd2), rtol=1e-5)


def test_autocorrelation():
    x = jnp.arange(10.0)
    ac = autocorrelation(x)
    np.testing.assert_allclose(float(ac[0]), 1.0, rtol=1e-5)
    assert ac.shape == (10,)
    # white noise decorrelates
    n = jax.random.normal(jax.random.key(6), (5000,))
    ac = autocorrelation(n)
    assert abs(float(ac[10])) < 0.1


def test_autocovariance_consistent():
    x = jax.random.normal(jax.random.key(7), (2000,))
    ac = autocovariance(x)
    np.testing.assert_allclose(
        float(ac[0]), float(jnp.var(x)), rtol=0.05
    )


def test_gelman_rubin_mixed_chains_near_one():
    x = jax.random.normal(jax.random.key(8), (4, 5000))
    r = gelman_rubin(x)
    assert 0.99 < float(r) < 1.05
    rs = split_gelman_rubin(x)
    assert 0.99 < float(rs) < 1.05
    # diverged chains blow up r_hat
    y = x + jnp.asarray([0.0, 5.0, 10.0, 15.0])[:, None]
    assert float(gelman_rubin(y)) > 2.0


def test_effective_sample_size_iid():
    x = jax.random.normal(jax.random.key(9), (4, 2000))
    ess = effective_sample_size(x)
    assert 0.5 * 8000 < float(ess) < 1.5 * 8000


@pytest.mark.parametrize("replacement", [True, False])
def test_resample(replacement):
    x = jnp.arange(100.0)
    y = resample(
        x, 30, replacement=replacement, rng_key=jax.random.key(10)
    )
    assert y.shape == (30,)
    if not replacement:
        assert len(set(np.asarray(y).tolist())) == 30


@pytest.mark.parametrize("event_shape", [(), (4,), (3, 2)], ids=str)
@pytest.mark.parametrize("num_samples", [2, 3, 10])
def test_crps_empirical(num_samples, event_shape):
    """CRPS equals its brute-force definition (ref test_stats.py:317)."""
    from pyro_tpu.ops.stats import crps_empirical

    truth = jax.random.normal(jax.random.key(11), event_shape)
    pred = truth + 0.1 * jax.random.normal(
        jax.random.key(12), (num_samples,) + event_shape
    )
    actual = crps_empirical(pred, truth)
    assert actual.shape == truth.shape
    expected = jnp.abs(pred - truth).mean(0) - 0.5 * jnp.abs(
        pred[:, None] - pred[None, :]
    ).mean(axis=(0, 1))
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("k,sigma", [(0.2, 1.0), (0.5, 2.0)])
def test_fit_generalized_pareto(k, sigma):
    from pyro_tpu.ops.stats import fit_generalized_pareto

    # inverse-CDF sampling of GPD(k, sigma)
    u = jax.random.uniform(jax.random.key(13), (20000,))
    X = sigma * ((1 - u) ** (-k) - 1) / k
    fit_k, fit_sigma = fit_generalized_pareto(X)
    np.testing.assert_allclose(float(fit_k), k, atol=0.05)
    np.testing.assert_allclose(float(fit_sigma), sigma, rtol=0.05)
