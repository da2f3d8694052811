"""StreamingMCMC: memory-bounded chains computing streaming statistics.

Ref ``pyro/infer/mcmc/api.py:653`` (StreamingMCMC) +
``pyro/ops/streaming.py``.  Samples are folded into Welford mean/variance
accumulators inside the ``lax.scan``, so memory is O(latent_dim)
independent of num_samples — the natural fit for long TPU chains.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp


class StreamingMCMC:
    """Ref ``api.py:653``."""

    def __init__(
        self,
        kernel,
        num_samples: int,
        warmup_steps: Optional[int] = None,
        num_chains: int = 1,
        statistics=None,
    ):
        self.kernel = kernel
        self.num_samples = num_samples
        self.warmup_steps = (
            num_samples if warmup_steps is None else warmup_steps
        )
        self.num_chains = num_chains
        self._stats = None

    def run(self, *args, rng_key=None, **kwargs):
        if rng_key is None:
            rng_key = jax.random.key(0)
        # split exactly as MCMC.run does (api.py:91) so the same rng_key
        # yields the same chain keys — StreamingMCMC's statistics then
        # equal dense MCMC's over the SAME draws (tested in
        # tests/test_mcmc_api.py), the reference's api-consistency
        # contract (ref tests/infer/mcmc/test_mcmc_api.py:289-326)
        key_setup, _key_init, key_chains = jax.random.split(rng_key, 3)
        self.kernel.setup(
            self.warmup_steps, *args, rng_key=key_setup, **kwargs
        )
        chain_keys = jax.random.split(key_chains, self.num_chains)

        def run_chain(key):
            k_draw, k_state = jax.random.split(key)
            init_flat = self.kernel._draw_init(k_draw)
            state = self.kernel.init_state(k_state, init_flat)

            def warm(state, _):
                return self.kernel.sample_step(state), None

            state, _ = jax.lax.scan(
                warm, state, None, length=self.warmup_steps
            )

            dim = state.z.shape[0]
            acc0 = {
                "count": jnp.zeros(()),
                "mean": jnp.zeros(dim),
                "m2": jnp.zeros(dim),
            }

            def samp(carry, _):
                state, acc = carry
                state = self.kernel.sample_step(state)
                n = acc["count"] + 1
                delta = state.z - acc["mean"]
                mean = acc["mean"] + delta / n
                m2 = acc["m2"] + delta * (state.z - mean)
                return (state, {"count": n, "mean": mean, "m2": m2}), None

            (state, acc), _ = jax.lax.scan(
                samp, (state, acc0), None, length=self.num_samples
            )
            return acc

        accs = jax.jit(jax.vmap(run_chain))(chain_keys)
        self._flat_stats = accs
        # convert to constrained per-site stats via the delta method is
        # nontrivial; report unconstrained stats plus constrained means via
        # postprocessing the mean point
        unravel = self.kernel._unravel
        post = self.kernel.postprocess_fn
        mean_constrained = jax.vmap(lambda m: post(unravel(m)))(
            accs["mean"]
        )
        var_flat = accs["m2"] / jnp.maximum(accs["count"] - 1, 1)[..., None]
        self._stats = {
            "unconstrained_mean": accs["mean"],
            "unconstrained_variance": var_flat,
            "constrained_mean_point": mean_constrained,
        }
        return self

    def get_statistics(self) -> Dict:
        """Per-chain streaming statistics (ref ``api.py:get_statistics``)."""
        if self._stats is None:
            raise RuntimeError("call .run() first")
        return self._stats
