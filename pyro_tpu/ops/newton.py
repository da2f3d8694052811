"""Batched trust-region Newton steps (ref ``pyro/ops/newton.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp



def newton_step(loss_fn, x, trust_radius=None):
    """One Newton update on the rightmost dim of x (dispatches on dim,
    ref ``newton.py:newton_step``).  Returns ``(mode, cov)`` where
    ``cov`` is the inverse Hessian (the Laplace covariance estimate,
    matching the reference contract, ref ``newton.py:56-59``)."""
    dim = x.shape[-1]
    if dim == 1:
        return newton_step_1d(loss_fn, x, trust_radius)
    if dim == 2:
        return newton_step_2d(loss_fn, x, trust_radius)
    if dim == 3:
        return newton_step_3d(loss_fn, x, trust_radius)
    raise NotImplementedError("newton_step supports dims 1, 2, 3")


def newton_step_1d(loss_fn, x, trust_radius=None):
    return _batched_newton(loss_fn, x, trust_radius)


def newton_step_2d(loss_fn, x, trust_radius=None):
    return _batched_newton(loss_fn, x, trust_radius)


def newton_step_3d(loss_fn, x, trust_radius=None):
    return _batched_newton(loss_fn, x, trust_radius)


def _batched_newton(loss_fn, x, trust_radius):
    """Per-batch-element Newton using vmapped grad/hessian over the
    rightmost dim."""
    batch_shape = x.shape[:-1]
    d = x.shape[-1]
    flat = x.reshape(-1, d)

    def one(v, idx):
        def scalar_loss(u):
            full = flat.at[idx].set(u)
            return jnp.sum(loss_fn(full.reshape(x.shape)))

        g = jax.grad(scalar_loss)(v)
        H = jax.hessian(scalar_loss)(v)
        H_reg = H + 1e-8 * jnp.eye(d)
        step = -jnp.linalg.solve(H_reg, g)
        if trust_radius is not None:
            norm = jnp.linalg.norm(step)
            step = step * jnp.minimum(
                1.0, trust_radius / jnp.clip(norm, 1e-12)
            )
        cov = jnp.linalg.inv(H_reg)
        return jax.lax.stop_gradient(v) + step, cov

    xs, covs = jax.vmap(one)(flat, jnp.arange(flat.shape[0]))
    return xs.reshape(x.shape), covs.reshape(batch_shape + (d, d))
