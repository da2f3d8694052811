"""Welford streaming (co)variance (ref ``pyro/ops/welford.py:7,54``).

Functional NamedTuple states usable inside jitted warmup loops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray  # sum of squared deviations (diag) or outer products
    n: jnp.ndarray


def welford_init(size: int, diagonal: bool = True) -> WelfordState:
    mean = jnp.zeros(size)
    m2 = jnp.zeros(size) if diagonal else jnp.zeros((size, size))
    return WelfordState(mean, m2, jnp.zeros(()))


def welford_update(state: WelfordState, x) -> WelfordState:
    n = state.n + 1
    delta = x - state.mean
    mean = state.mean + delta / n
    delta2 = x - mean
    if state.m2.ndim == 1:
        m2 = state.m2 + delta * delta2
    else:
        m2 = state.m2 + jnp.outer(delta2, delta)
    return WelfordState(mean, m2, n)


def welford_covariance(state: WelfordState, regularize: bool = True):
    """Sample (co)variance with Stan-style shrinkage toward unity
    (ref ``welford.py:38-52``)."""
    cov = state.m2 / jnp.maximum(state.n - 1, 1)
    if regularize:
        n = state.n
        scale = n / (n + 5.0)
        shrink = 1e-3 * (5.0 / (n + 5.0))
        if cov.ndim == 1:
            cov = scale * cov + shrink
        else:
            cov = scale * cov + shrink * jnp.eye(cov.shape[0])
    return cov
