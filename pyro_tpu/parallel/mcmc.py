"""Sharded-chain MCMC over a device mesh.

TPU-native replacement for ``pyro/infer/mcmc/api.py:88-351`` process pools
(SURVEY P4): chains are already a vmapped leading axis in
``pyro_tpu.infer.MCMC``; here that axis is sharded over a mesh axis so N
chips run N× chains with zero communication (chains are independent; only
diagnostics gather at the end).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..infer.mcmc.api import MCMC


def sharded_chain_mcmc(
    kernel,
    num_samples: int,
    warmup_steps: Optional[int] = None,
    num_chains: Optional[int] = None,
    mesh: Optional[Mesh] = None,
    chain_axis: str = "chain",
) -> MCMC:
    """Build an MCMC whose chain axis is sharded over the mesh.

    ``num_chains`` defaults to one per device; it must be divisible by the
    mesh axis size.
    """
    if mesh is None:
        from .mesh import create_mesh

        mesh = create_mesh(axis_names=(chain_axis,))
    axis_size = mesh.shape[chain_axis]
    if num_chains is None:
        num_chains = axis_size
    if num_chains % axis_size:
        raise ValueError(
            f"num_chains={num_chains} not divisible by mesh axis "
            f"'{chain_axis}' of size {axis_size}"
        )

    mcmc = MCMC(
        kernel,
        num_samples,
        warmup_steps=warmup_steps,
        num_chains=num_chains,
    )
    orig_run = mcmc.run
    sharding = NamedSharding(mesh, P(chain_axis))

    def run(*args, rng_key=None, **kwargs):
        # shard the per-chain RNG keys; everything downstream follows
        import jax.numpy as jnp

        if rng_key is None:
            rng_key = jax.random.key(0)
        # monkey-wrap jax.random.split used in run? Simpler: run as usual
        # but with a sharding constraint on chain keys via closure
        return _run_sharded(mcmc, sharding, *args, rng_key=rng_key, **kwargs)

    mcmc.run_sharded = run  # type: ignore[attr-defined]
    mcmc._chain_sharding = sharding  # used by api.run if present
    return mcmc


def _run_sharded(mcmc: MCMC, sharding, *args, rng_key=None, **kwargs):
    """Run with the chain axis sharded: identical to MCMC.run but places the
    per-chain key array on the mesh before the vmapped scan."""
    mcmc._key_sharding = sharding
    try:
        return mcmc.run(*args, rng_key=rng_key, **kwargs)
    finally:
        mcmc._key_sharding = None
