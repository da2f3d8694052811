"""MCMC kernel protocol (ref ``pyro/infer/mcmc/mcmc_kernel.py:7``).

Kernels expose ``setup`` (trace the model, build potential_fn),
``init_state`` (per-chain state), and a pure ``sample_step`` suitable for
``vmap`` over chains and ``lax.scan`` over iterations.
"""

from __future__ import annotations

from typing import Optional


class MCMCKernel:
    def setup(self, warmup_steps, *args, **kwargs):
        return self

    def cleanup(self):
        pass

    def init_state(self, rng_key, initial_flat=None):
        raise NotImplementedError

    def sample_step(self, state):
        raise NotImplementedError

    def logging(self):
        return None

    def diagnostics(self):
        return {}
