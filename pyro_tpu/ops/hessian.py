"""Hessian computation (ref ``pyro/ops/hessian.py:22``)."""

from __future__ import annotations

import jax
import jax.flatten_util
import jax.numpy as jnp


def hessian(fn, x):
    """Dense Hessian of a scalar fn at x (array or pytree)."""
    if isinstance(x, jnp.ndarray):
        return jax.hessian(fn)(x)
    flat, unravel = jax.flatten_util.ravel_pytree(x)

    def flat_fn(f):
        return fn(unravel(f))

    return jax.hessian(flat_fn)(flat)
