"""Statistical diagnostics and metrics (ref ``pyro/ops/stats.py``).

Conventions follow the reference: chain statistics take input of shape
``(num_chains, num_samples, ...)`` (``sample_dim=1``) or
``(num_samples, ...)``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def autocorrelation(x, dim: int = 0):
    """FFT-based autocorrelation along ``dim`` (ref ``stats.py:87``)."""
    n = x.shape[dim]
    x = jnp.moveaxis(x, dim, -1)
    centered = x - jnp.mean(x, axis=-1, keepdims=True)
    # pad to 2n for circular-to-linear conversion
    m = int(2 ** math.ceil(math.log2(2 * n)))
    f = jnp.fft.rfft(centered, n=m, axis=-1)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=m, axis=-1)[..., :n]
    acorr = acov / acov[..., :1]
    return jnp.moveaxis(acorr, -1, dim)


def autocovariance(x, dim: int = 0):
    n = x.shape[dim]
    x_ = jnp.moveaxis(x, dim, -1)
    var = jnp.var(x_, axis=-1, keepdims=True)
    ac = jnp.moveaxis(autocorrelation(x, dim), dim, -1) * var
    return jnp.moveaxis(ac, -1, dim)


def gelman_rubin(x, chain_dim: int = 0, sample_dim: int = 1):
    """Potential scale reduction factor R-hat (ref ``stats.py:32``)."""
    x = jnp.moveaxis(x, (chain_dim, sample_dim), (0, 1))
    C, N = x.shape[0], x.shape[1]
    chain_mean = jnp.mean(x, axis=1)
    chain_var = jnp.var(x, axis=1, ddof=1)
    W = jnp.mean(chain_var, axis=0)
    B = N * jnp.var(chain_mean, axis=0, ddof=1)
    var_hat = (N - 1) / N * W + B / N
    return jnp.sqrt(var_hat / W)


def split_gelman_rubin(x, chain_dim: int = 0, sample_dim: int = 1):
    """R-hat over split-in-half chains (ref ``stats.py:58``)."""
    x = jnp.moveaxis(x, (chain_dim, sample_dim), (0, 1))
    C, N = x.shape[0], x.shape[1]
    half = N // 2
    split = jnp.concatenate(
        [x[:, :half], x[:, half : 2 * half]], axis=0
    )
    return gelman_rubin(split)


def effective_sample_size(x, chain_dim: int = 0, sample_dim: int = 1):
    """ESS with Geyer initial monotone sequence (ref ``stats.py:162``)."""
    x = jnp.moveaxis(x, (chain_dim, sample_dim), (0, 1))
    C, N = x.shape[0], x.shape[1]
    # per-chain autocovariance, averaged
    gamma = autocovariance(x, dim=1)  # (C, N, ...)
    var_within = jnp.var(x, axis=1, ddof=1)  # (C, ...)
    gamma_mean = jnp.mean(gamma, axis=0)  # (N, ...)
    W = jnp.mean(var_within, axis=0)
    chain_mean = jnp.mean(x, axis=1)
    if C > 1:
        B_over_n = jnp.var(chain_mean, axis=0, ddof=1)
    else:
        B_over_n = jnp.zeros_like(W)
    var_hat = (N - 1) / N * W + B_over_n
    rho = 1.0 - (W - gamma_mean) / var_hat  # (N, ...)

    # Geyer: sum consecutive pairs; find first negative pair; monotone decrease
    n_pairs = N // 2
    paired = rho[: 2 * n_pairs].reshape((n_pairs, 2) + rho.shape[1:]).sum(1)
    # make monotone non-increasing
    paired_mono = jax.lax.associative_scan(jnp.minimum, paired, axis=0)
    # zero-out after first negative
    positive = paired_mono > 0
    keep = jnp.cumprod(positive.astype(paired.dtype), axis=0)
    tau = -1.0 + 2.0 * jnp.sum(paired_mono * keep, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(float(C * N))))
    return C * N / tau


def quantile(x, probs, dim: int = 0):
    """Ref ``stats.py:236``."""
    return jnp.quantile(x, jnp.asarray(probs), axis=dim)


def pi(x, prob: float, dim: int = 0):
    """Percentile interval (ref ``stats.py:328``)."""
    lo, hi = (1 - prob) / 2, (1 + prob) / 2
    return quantile(x, [lo, hi], dim)


def hpdi(x, prob: float, dim: int = 0):
    """Highest posterior density interval (ref ``stats.py:341``)."""
    x_sorted = jnp.sort(x, axis=dim)
    n = x.shape[dim]
    mass = int(prob * n)
    mass = max(1, min(mass, n - 1))
    lower_all = jnp.take(
        x_sorted, jnp.arange(n - mass), axis=dim
    )
    upper_all = jnp.take(
        x_sorted, jnp.arange(mass, n), axis=dim
    )
    widths = upper_all - lower_all
    best = jnp.argmin(widths, axis=dim, keepdims=True)
    lower = jnp.take_along_axis(lower_all, best, axis=dim)
    upper = jnp.take_along_axis(upper_all, best, axis=dim)
    return jnp.concatenate([lower, upper], axis=dim)


def resample(x, num_samples: int, dim: int = 0, replacement: bool = False, rng_key=None):
    """Ref ``stats.py:222``."""
    if rng_key is None:
        rng_key = jax.random.key(0)
    n = x.shape[dim]
    if replacement:
        idx = jax.random.randint(rng_key, (num_samples,), 0, n)
    else:
        idx = jax.random.permutation(rng_key, n)[:num_samples]
    return jnp.take(x, idx, axis=dim)


def _weighted_mean(x, log_weights, dim=0, keepdims=False):
    dim = jnp.ndim(x) + dim if dim < 0 else dim
    lw = log_weights.reshape((-1,) + (1,) * (jnp.ndim(x) - dim - 1))
    rel = jnp.exp(lw - jnp.max(lw, axis=0))
    return jnp.sum(x * rel, axis=dim, keepdims=keepdims) / jnp.sum(rel)


def _weighted_variance(x, log_weights, dim=0, keepdims=False, unbiased=True):
    dev2 = (x - _weighted_mean(x, log_weights, dim, keepdims=True)) ** 2
    n = log_weights.shape[0]
    correction = n / (n - 1.0) if unbiased else 1.0
    return _weighted_mean(dev2, log_weights, dim, keepdims) * correction


def waic(x, log_weights=None, pointwise: bool = False, dim: int = 0):
    """Widely applicable information criterion (ref ``stats.py:385``),
    with optional importance weights over the sample dim ``dim``."""
    from jax.scipy.special import logsumexp

    if log_weights is None:
        log_weights = jnp.zeros(x.shape[dim])
    dim = jnp.ndim(x) + dim if dim < 0 else dim
    lw = log_weights.reshape((-1,) + (1,) * (jnp.ndim(x) - dim - 1))
    lpd = logsumexp(x + lw, axis=dim) - logsumexp(log_weights, axis=0)
    p_waic = _weighted_variance(x, log_weights, dim)
    elpd = lpd - p_waic
    waic_val = -2 * elpd
    if pointwise:
        return waic_val, p_waic
    return jnp.sum(waic_val), jnp.sum(p_waic)


def crps_empirical(pred, truth):
    """Continuous ranked probability score (ref ``stats.py:468``).

    ``pred``: (num_samples,) + truth.shape forecast samples.
    Uses the O(n log n) sorted-weight formulation.
    """
    n = pred.shape[0]
    diff = jnp.abs(pred - truth[None])
    mean_abs_err = jnp.mean(diff, axis=0)
    pred_sorted = jnp.sort(pred, axis=0)
    i = jnp.arange(n, dtype=pred.dtype)
    shape = (n,) + (1,) * (pred.ndim - 1)
    weights = (2 * i + 1 - n).reshape(shape)
    spread = jnp.sum(weights * pred_sorted, axis=0) / (n * n)
    return mean_abs_err - spread


def fit_generalized_pareto(x):
    """Zhang & Stephens (2009) GPD fit (ref ``stats.py:419``), used by the
    PSIS diagnostic.  Operates on a 1-D sorted-ascending numpy array."""
    x = np.sort(np.asarray(x))
    n = len(x)
    prior_bs = 3.0
    m_est = 30 + int(math.sqrt(n))
    b = 1 - np.sqrt(m_est / (np.arange(1, m_est + 1) - 0.5))
    b = b / (prior_bs * x[int(n / 4 + 0.5) - 1]) + 1 / x[-1]
    k = -b[:, None] * x[None, :]
    k = np.mean(np.log1p(k), axis=1)
    l = n * (np.log(-b / k) - k - 1)
    w = 1 / np.sum(np.exp(l - l[:, None]), axis=1)
    b_post = np.sum(b * w)
    k_post = np.mean(np.log1p(-b_post * x))
    sigma = -k_post / b_post
    k_post = k_post * n / (n + 10.0) + 5.0 / (n + 10.0) * 0.5
    return k_post, sigma


def energy_score_empirical(pred, truth):
    """Multivariate CRPS generalization (ref ``stats.py:513``).

    pred: (num_samples, d); truth: (d,).
    """
    n = pred.shape[0]
    t1 = jnp.mean(jnp.linalg.norm(pred - truth[None], axis=-1))
    pairwise = jnp.linalg.norm(
        pred[:, None, :] - pred[None, :, :], axis=-1
    )
    t2 = jnp.sum(pairwise) / (2 * n * n)
    return t1 - t2


def weighed_quantile(input, probs, log_weights, dim: int = 0):
    """Quantiles of weighed samples (ref ``stats.py:265``)."""
    input = jnp.asarray(input)
    dim = dim if dim >= 0 else (input.ndim + dim)
    probs = jnp.asarray(probs, input.dtype)
    from jax.scipy.special import logsumexp

    weights = jnp.exp(log_weights - logsumexp(jnp.asarray(log_weights)))
    sorting_indices = jnp.argsort(input, axis=dim)
    sorted_input = jnp.take_along_axis(input, sorting_indices, axis=dim)
    w = jnp.cumsum(weights[sorting_indices], axis=dim)
    w = w - jnp.min(w, axis=dim, keepdims=True)
    w = w / jnp.max(w, axis=dim, keepdims=True)
    indices_above = jnp.clip(
        jnp.swapaxes(
            jnp.sum(w[..., None] <= probs, axis=dim, keepdims=True),
            dim,
            -1,
        )[..., 0],
        None,
        input.shape[dim] - 1,
    )
    indices_below = jnp.clip(indices_above - 1, 0)
    q_below = jnp.take_along_axis(sorted_input, indices_below, axis=dim)
    q_above = jnp.take_along_axis(sorted_input, indices_above, axis=dim)
    probs_shape = [None] * dim + [slice(None)] + [None] * (
        input.ndim - dim - 1
    )
    expanded = list(input.shape)
    expanded[dim] = len(probs)
    probs_b = jnp.broadcast_to(probs[tuple(probs_shape)], expanded)
    w_below = jnp.take_along_axis(w, indices_below, axis=dim)
    w_above = jnp.take_along_axis(w, indices_above, axis=dim)
    frac_below = (w_above - probs_b) / jnp.clip(
        w_above - w_below, jnp.finfo(input.dtype).tiny
    )
    frac_above = 1 - frac_below
    return frac_below * q_below + frac_above * q_above
