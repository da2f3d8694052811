"""Special functions (ref ``pyro/ops/special.py``)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp


def safe_log(x):
    """log clamped away from -inf for zero inputs (ref ``special.py:safe_log``)."""
    finfo = jnp.finfo(jnp.result_type(x, jnp.float32))
    return jnp.log(jnp.clip(x, finfo.tiny))


def log_beta(x, y, tol: float = 0.0):
    """log Beta(x, y), optionally with a cheaper Stirling approximation
    controlled by ``tol`` (ref ``pyro/ops/special.py:log_beta``)."""
    if tol < 0.02:
        return jsp.gammaln(x) + jsp.gammaln(y) - jsp.gammaln(x + y)
    # Stirling with shift (ref implementation uses order-dependent shift)
    shift = max(1, int(-0.5 - math.log(tol) / 2))
    xy = x + y
    factors = []
    for _ in range(shift):
        factors.append(xy / (x * y))
        x = x + 1
        y = y + 1
        xy = xy + 1
    log_factor = sum(jnp.log(f) for f in factors)
    return (
        log_factor
        + (x - 0.5) * jnp.log(x)
        + (y - 0.5) * jnp.log(y)
        - (xy - 0.5) * jnp.log(xy)
        + (math.log(2 * math.pi) / 2 - shift * 0.0)
        + (1 / 12) * (1 / x + 1 / y - 1 / xy)
    )


def log_binomial(n, k, tol: float = 0.0):
    """log C(n, k) (ref ``pyro/ops/special.py:log_binomial``)."""
    return -log_beta(1.0 + n - k, 1.0 + k, tol=tol) - jnp.log1p(n)


def log_i0(x):
    """log of the modified Bessel function I0 (for von Mises)."""
    # jsp has i0e: I0(x) * exp(-|x|)
    return jnp.log(jsp.i0e(x)) + jnp.abs(x)

def log_i1(x):
    """log I1 (for von Mises variance)."""
    return jnp.log(jsp.i1e(x)) + jnp.abs(x)


def get_quad_rule(num_quad, dtype=jnp.float32):
    """Gauss-Hermite quadrature (points, log-weights) for latent-variable
    integration (ref ``pyro/ops/special.py:get_quad_rule``)."""
    import numpy as np

    quad_rule = np.polynomial.hermite_e.hermegauss(num_quad)
    quad_points = jnp.asarray(quad_rule[0], dtype)
    log_weights = jnp.asarray(
        np.log(quad_rule[1]) - 0.5 * math.log(2 * math.pi), dtype
    )
    return quad_points, log_weights


def logsumexp(x, axis=None, keepdims=False):
    return jsp.logsumexp(x, axis=axis, keepdims=keepdims)


def sparse_multinomial_likelihood(total_count, nonzero_logits, nonzero_counts):
    """Sparse multinomial log-likelihood (ref ``special.py``)."""
    return (
        jsp.gammaln(total_count + 1)
        - jnp.sum(jsp.gammaln(nonzero_counts + 1), axis=-1)
        + jnp.sum(nonzero_logits * nonzero_counts, axis=-1)
    )


def log_I1(orders: int, value, terms: int = 250):
    """First ``orders+1`` log modified Bessel functions of the first kind
    (ref ``special.py:113``); used by von Mises-family models."""
    import jax

    value = jnp.asarray(value, jnp.result_type(float))
    vshape = value.shape if value.ndim else (1,)
    value = value.reshape(-1, 1)
    orders = orders + 1

    k = jnp.arange(terms)
    lgammas_all = jax.lax.lgamma(
        jnp.arange(1.0, terms + orders + 1)
    )
    lvalues = jnp.log(value / 2) * k[None, :]
    lfactorials = lgammas_all[:terms]
    lgammas = jnp.tile(lgammas_all, (orders, 1))
    indices = k[:orders][:, None] + k[None, :]
    from jax.scipy.special import logsumexp

    seqs = logsumexp(
        2 * lvalues[None, :, :]
        - lfactorials[None, None, :]
        - jnp.take_along_axis(lgammas, indices, axis=1)[:, None, :],
        axis=-1,
    )
    i1s = lvalues[..., :orders].T + seqs
    return i1s.reshape(-1, *vshape)
