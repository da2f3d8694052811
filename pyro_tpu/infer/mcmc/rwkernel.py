"""Random-walk Metropolis kernel with adaptive step scale.

Ref ``pyro/infer/mcmc/rwkernel.py:15``: proposal x' = x + scale * eps,
scale adapted during warmup toward 0.234 acceptance.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp

from .hmc import HMC, AdaptState, HMCState
from ...ops.dual_averaging import da_init, da_step


class RandomWalkKernel(HMC):
    """Reuses the HMC state container (momentum fields unused) so chains
    vmap/scan identically."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        init_step_size: float = 0.1,
        target_accept_prob: float = 0.234,
        init_strategy: str = "uniform",
    ):
        super().__init__(
            model=model,
            potential_fn=potential_fn,
            step_size=init_step_size,
            num_steps=1,
            adapt_step_size=True,
            adapt_mass_matrix=False,
            target_accept_prob=target_accept_prob,
            init_strategy=init_strategy,
        )

    def init_state(self, rng_key, initial_flat=None) -> HMCState:
        z = self._initial_flat if initial_flat is None else initial_flat
        pe = self.potential_fn(z)
        key_state = rng_key
        step_size = jnp.asarray(self.step_size, jnp.float32)
        da = da_init(prox_center=jnp.log(10.0 * step_size))
        from ...ops.welford import welford_init

        adapt = AdaptState(
            step_size, jnp.ones_like(z), da, welford_init(z.shape[0])
        )
        zero = jnp.zeros(())
        return HMCState(
            jnp.zeros((), jnp.int32),
            z,
            pe,
            jnp.zeros_like(z),
            pe,
            jnp.ones((), jnp.int32),
            zero,
            zero,
            jnp.zeros((), bool),
            adapt,
            key_state,
        )

    def sample_step(self, state: HMCState) -> HMCState:
        key, k_prop, k_mh = jax.random.split(state.rng_key, 3)
        step_size = state.adapt.step_size
        eps = jax.random.normal(k_prop, state.z.shape)
        z_new = state.z + step_size * eps
        pe_new = self.potential_fn(z_new)
        delta = pe_new - state.potential_energy
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        accept_prob = jnp.minimum(1.0, jnp.exp(-delta))
        accept = jax.random.uniform(k_mh) < accept_prob
        z = jnp.where(accept, z_new, state.z)
        pe = jnp.where(accept, pe_new, state.potential_energy)

        # step-size adaptation during warmup
        in_warmup = state.i < self._num_warmup
        da = da_step(state.adapt.da, self.target_accept_prob - accept_prob)
        is_last = state.i == (self._num_warmup - 1)
        new_step = jnp.where(
            in_warmup,
            jnp.where(is_last, jnp.exp(da.x_avg), jnp.exp(da.x_t)),
            step_size,
        )
        da = jax.tree.map(
            lambda n, o: jnp.where(in_warmup, n, o), da, state.adapt.da
        )
        adapt = AdaptState(
            new_step, state.adapt.inverse_mass_diag, da, state.adapt.welford
        )
        i = state.i + 1
        n_after = jnp.maximum(i - self._num_warmup, 1)
        mean_accept = jnp.where(
            state.i < self._num_warmup,
            state.mean_accept_prob
            + (accept_prob - state.mean_accept_prob) / jnp.maximum(i, 1),
            state.mean_accept_prob
            + (accept_prob - state.mean_accept_prob) / n_after,
        )
        return HMCState(
            i,
            z,
            pe,
            state.z_grad,
            pe,
            jnp.ones((), jnp.int32),
            accept_prob,
            mean_accept,
            jnp.zeros((), bool),
            adapt,
            key,
        )
