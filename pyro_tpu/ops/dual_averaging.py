"""Nesterov dual averaging (ref ``pyro/ops/dual_averaging.py:5``).

Functional formulation: state is a NamedTuple so it can live inside
``lax.scan``/``while_loop`` during jitted warmup.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp


class DAState(NamedTuple):
    prox_center: jnp.ndarray  # mu
    g_avg: jnp.ndarray  # running average of gradients (error terms)
    t: jnp.ndarray  # step count
    x_t: jnp.ndarray  # primal iterate (log step size)
    x_avg: jnp.ndarray  # averaged iterate


def da_init(prox_center=0.0) -> DAState:
    z = jnp.zeros(())
    return DAState(jnp.asarray(prox_center, jnp.float32), z, z, z, z)


def da_step(state: DAState, g, gamma=0.05, t0=10.0, kappa=0.75) -> DAState:
    """One update with 'gradient' g (ref ``dual_averaging.py:60-80``)."""
    t = state.t + 1
    g_avg = (1 - 1 / (t + t0)) * state.g_avg + g / (t + t0)
    x_t = state.prox_center - (t**0.5) / gamma * g_avg
    weight_t = t ** (-kappa)
    x_avg = (1 - weight_t) * state.x_avg + weight_t * x_t
    return DAState(state.prox_center, g_avg, t, x_t, x_avg)
