"""Numerical log-density of alpha-stable distributions.

Ref ``pyro/distributions/stable_log_prob.py``: evaluates Nolan's integral
representation of the S0-parameterized stable density with Gauss-Legendre
quadrature, with linear interpolation across the removable singularities
at ``alpha = 1`` and ``value = loc`` (where the integrand degenerates).

TPU notes: the quadrature is one fixed-size batched ``logsumexp`` over the
501 Legendre nodes — fully jittable and differentiable (the reference's
boolean-index branches become ``jnp.where`` selects).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

VALUE_NEAR_ZERO_TOL_ALPHA = 0.01
VALUE_NEAR_ZERO_TOL_DENSITY = 0.1
ALPHA_NEAR_ONE_TOL = 0.05
ALPHA_NEAR_ONE_TOL_F32 = 0.2

def _max_log(dtype):
    # widest exponent that still exponentiates finitely in this dtype
    return 0.99 * math.log(float(jnp.finfo(dtype).max))

_NUM_POINTS = 501


def _legendre_nodes():
    from scipy.special import roots_legendre

    roots, weights = roots_legendre(_NUM_POINTS)
    return jnp.asarray(roots), jnp.asarray(weights)


def _integrate(fn, lo, hi):
    """log of integral of exp(fn) over [lo, hi] by Gauss-Legendre."""
    roots, weights = _legendre_nodes()
    sl = (slice(None),) + (None,) * jnp.ndim(lo)
    half = roots[sl] * 0.5
    value = lo * (0.5 - half) + hi * (0.5 + half)
    return (
        logsumexp(fn(value) + jnp.log(weights)[sl], axis=0)
        + jnp.log((hi - lo) / 2)
    )


def _log_prob_at_zero(alpha, beta):
    """Density at the S^alpha-parameterization origin (ref :188)."""
    inv_alpha = 1 / alpha
    ha = math.pi / 2 * alpha
    atan_b = jnp.arctan(beta * jnp.tan(ha))
    log_prob = (
        jnp.log(jnp.cos(inv_alpha * atan_b))
        - inv_alpha * jnp.log(jnp.cos(atan_b))
        + jax.lax.lgamma(1 + inv_alpha)
        - math.log(math.pi)
    )
    m = _max_log(jnp.result_type(alpha))
    return jnp.clip(log_prob, -m, m)


def _given_uniform_log_prob(V, alpha, beta, Z):
    """Integrand of Nolan's representation (ref :154)."""
    inv_am1 = 1 / (alpha - 1)
    half_pi = math.pi / 2
    eps = jnp.finfo(V.dtype).eps
    V = jnp.clip(V, 2 * eps - half_pi, half_pi - 2 * eps)
    ha = half_pi * alpha
    atan_b = jnp.arctan(beta * jnp.tan(ha))
    cos_V = jnp.cos(V)

    v = atan_b - ha + alpha * (V + half_pi)

    term1 = jnp.log(jnp.cos(atan_b)) * inv_am1
    term2 = jnp.log(Z * cos_V / jnp.sin(v)) * alpha * inv_am1
    term3 = jnp.log(jnp.cos(v - V) / cos_V)
    W_log = term1 + term2 + term3
    m = _max_log(V.dtype)
    W = jnp.exp(jnp.clip(W_log, -m, m))

    log_prob = -W + jnp.log(
        jnp.abs(alpha * W / Z / (alpha - 1))
    )
    log_prob = jnp.where(jnp.isinf(W) | (W >= jnp.finfo(V.dtype).max * 0.5), -jnp.inf, log_prob)
    return jnp.clip(log_prob, -m, m)


def _unsafe_log_prob(alpha, beta, Z):
    """log p(Z); fails near alpha=1 and Z=0 (ref :130)."""
    ha = math.pi / 2 * alpha
    atan_b = jnp.arctan(beta * jnp.tan(ha))
    u_zero = -atan_b / alpha

    flip = Z < 0
    beta = jnp.where(flip, -beta, beta)
    u_zero = jnp.where(flip, -u_zero, u_zero)
    Z = jnp.where(flip, -Z, Z)

    return (
        _integrate(
            lambda V: _given_uniform_log_prob(V, alpha, beta, Z),
            u_zero,
            0.5 * math.pi * jnp.ones_like(u_zero),
        )
        - math.log(math.pi)
    )


def _log_prob_S0_safe_alpha(alpha, beta, Z):
    """log p in S0 coords for alpha away from 1 (ref :90)."""
    Z = Z + beta * jnp.tan(math.pi / 2 * alpha)

    near_zero_tol = jnp.minimum(
        VALUE_NEAR_ZERO_TOL_ALPHA * alpha / jnp.abs(1 - alpha),
        VALUE_NEAR_ZERO_TOL_DENSITY
        / jnp.exp(_log_prob_at_zero(alpha, jnp.zeros_like(alpha))),
    )
    near_zero = jnp.abs(Z) < near_zero_tol

    lp_safe = _unsafe_log_prob(
        alpha, beta, jnp.where(near_zero, near_zero_tol, Z)
    )
    # interpolate across the value≈0 hole between ±near_zero_tol
    lp_neg = _unsafe_log_prob(alpha, beta, -near_zero_tol)
    w = Z / (2 * near_zero_tol) + 0.5
    eps = jnp.finfo(Z.dtype).eps  # NB: 1 - 1e-10 rounds to 1.0 in f32
    w = jnp.clip(w, eps, 1 - eps)
    lp_interp = jnp.logaddexp(lp_safe + jnp.log(w), lp_neg + jnp.log1p(-w))
    return jnp.where(near_zero, lp_interp, lp_safe)


def stable_log_prob(alpha, beta, value, coords="S0"):
    """Numerically-integrated stable log-density (ref :52).

    The reference evaluates Nolan's integrand in float64.  When
    ``jax_enable_x64`` is on we do the same (interpolating only across a
    narrow ``|alpha-1| < 0.05`` hole); in default float32 mode the
    integrand loses the integral for ``|alpha-1| < ~0.15``, so the
    interpolation band widens to ``|alpha-1| < 0.2`` — accuracy near
    alpha=1 is then ~1e-2 in log-density (adequate for HMC; enable x64
    for full accuracy)."""
    dtype_in = jnp.result_type(value, jnp.float32)
    x64 = bool(jax.config.read("jax_enable_x64"))
    compute_dtype = jnp.float64 if x64 else jnp.float32
    near_one_tol = ALPHA_NEAR_ONE_TOL if x64 else ALPHA_NEAR_ONE_TOL_F32
    alpha, beta, value = jnp.broadcast_arrays(
        jnp.asarray(alpha, compute_dtype),
        jnp.asarray(beta, compute_dtype),
        jnp.asarray(value, compute_dtype),
    )
    if coords == "S":
        value = jnp.where(
            alpha == 1,
            value,
            value - beta * jnp.tan(math.pi / 2 * alpha),
        )
    elif coords != "S0":
        raise ValueError(f"Unknown coords: {coords}")

    near_one = jnp.abs(alpha - 1) < near_one_tol
    lp_pos = _log_prob_S0_safe_alpha(
        jnp.where(near_one, 1 + near_one_tol, alpha), beta, value
    )
    # interpolate across the alpha≈1 hole
    lp_neg = _log_prob_S0_safe_alpha(
        jnp.full_like(alpha, 1 - near_one_tol), beta, value
    )
    w = (alpha - 1) / (2 * near_one_tol) + 0.5
    eps = jnp.finfo(compute_dtype).eps
    w = jnp.clip(w, eps, 1 - eps)
    lp_interp = jnp.logaddexp(lp_pos + jnp.log(w), lp_neg + jnp.log1p(-w))
    out = jnp.where(near_one, lp_interp, lp_pos)
    return out.astype(dtype_in)
