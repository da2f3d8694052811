"""Leapfrog integrator (ref ``pyro/ops/integrator.py:14``).

``z`` is a dict pytree of unconstrained latents.  The reference caches the
potential gradient between calls; here ``jax.value_and_grad`` + jit makes
the whole trajectory one fused XLA program, and divergences are detected by
value (non-finite energy) rather than by exception, since exceptions cannot
cross a compiled boundary.
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import jax
import jax.numpy as jnp


def potential_grad(potential_fn: Callable, z):
    """Returns (potential_energy, grad) with non-finite values signalling
    divergence (ref ``integrator.py:68-96``)."""
    pe, grad = jax.value_and_grad(potential_fn)(z)
    return pe, grad


def velocity_verlet(
    z: Dict,
    r: Dict,
    potential_fn: Callable,
    kinetic_grad: Callable,
    step_size,
    num_steps: int = 1,
    z_grads=None,
):
    """Second-order symplectic integrator (ref ``integrator.py:14-65``).

    kinetic_grad maps momentum r -> dK/dr (e.g. M^{-1} r).
    """
    if z_grads is None:
        _, z_grads = potential_grad(potential_fn, z)

    def step(carry, _):
        z, r, z_grads, _ = carry
        r_half = jax.tree.map(
            lambda r_, g: r_ - 0.5 * step_size * g, r, z_grads
        )
        dkdr = kinetic_grad(r_half)
        z_new = jax.tree.map(lambda z_, d: z_ + step_size * d, z, dkdr)
        pe_new, z_grads_new = potential_grad(potential_fn, z_new)
        r_new = jax.tree.map(
            lambda r_, g: r_ - 0.5 * step_size * g, r_half, z_grads_new
        )
        return (z_new, r_new, z_grads_new, pe_new), None

    if num_steps == 1:
        (z, r, z_grads, pe), _ = step((z, r, z_grads, 0.0), None)
    else:
        (z, r, z_grads, pe), _ = jax.lax.scan(
            step, (z, r, z_grads, 0.0), None, length=num_steps
        )
    return z, r, z_grads, pe
