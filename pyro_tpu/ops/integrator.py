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


# -- exception-handler registry (ref ``ops/integrator.py:97-125``) ----------
# Under jit, numerical failure shows up as non-finite energies rather than
# raised exceptions, so HMC flags divergences by value; this registry is
# for the eager paths (initialization, user potential_fns) where Python
# exceptions can still occur.
_EXCEPTION_HANDLERS = {}


def register_exception_handler(name, handler, warn_on_overwrite: bool = True):
    """Register ``handler(exception) -> bool`` marking recoverable
    numerical errors (treated as divergent transitions)."""
    import warnings

    if name in _EXCEPTION_HANDLERS and warn_on_overwrite:
        warnings.warn(f"overwriting exception handler {name!r}")
    _EXCEPTION_HANDLERS[name] = handler


def _is_recoverable_exception(e) -> bool:
    return any(h(e) for h in _EXCEPTION_HANDLERS.values())


def _value_error_handler(e):
    return isinstance(e, ValueError)


register_exception_handler("value_error", _value_error_handler, warn_on_overwrite=False)
