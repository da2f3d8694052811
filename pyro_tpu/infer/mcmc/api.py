"""MCMC chain orchestration.

Ref ``pyro/infer/mcmc/api.py:405``.  The reference runs ``num_chains`` in
separate OS processes with queues and events (``_MultiSampler:239``); the
TPU-native equivalent runs chains as a *vmapped leading axis* of one
compiled program — thousands of chains per chip — optionally sharded over a
device mesh (P4 in SURVEY §2.8).  The whole run (warmup + sampling) is two
``lax.scan`` calls under one jit.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.stats import effective_sample_size, hpdi, split_gelman_rubin
from .hmc import HMC, HMCState


class MCMC:
    """Ref ``api.py:405``."""

    def __init__(
        self,
        kernel,
        num_samples: int,
        warmup_steps: Optional[int] = None,
        initial_params: Optional[Dict] = None,
        num_chains: int = 1,
        hook_fn=None,
        mp_context=None,  # API parity; process parallelism replaced by vmap
        disable_progbar: bool = False,
        disable_validation: bool = True,
        transforms=None,
        save_params=None,
        chain_method: str = "vectorized",
        thinning: int = 1,
    ):
        self.kernel = kernel
        self.num_samples = num_samples
        self.warmup_steps = (
            num_samples if warmup_steps is None else warmup_steps
        )
        self.num_chains = num_chains
        self.chain_method = chain_method
        self.thinning = thinning
        self._initial_params = initial_params
        self._samples = None  # dict name -> (chains, samples, ...)
        self._diagnostics_extra = None
        self._last_state = None

    # -- run ---------------------------------------------------------------------
    def run(self, *args, rng_key=None, **kwargs):
        """Ref ``api.py:531``."""
        if rng_key is None:
            rng_key = jax.random.key(0)
        key_setup, key_init, key_chains = jax.random.split(rng_key, 3)
        self.kernel.setup(
            self.warmup_steps,
            *args,
            rng_key=key_setup,
            init_params=self._initial_params,
            **kwargs,
        )

        chain_keys = jax.random.split(key_chains, self.num_chains)
        # optional chain-axis sharding over a device mesh
        # (set by pyro_tpu.parallel.sharded_chain_mcmc)
        key_sharding = getattr(self, "_key_sharding", None)
        if key_sharding is not None:
            chain_keys = jax.device_put(chain_keys, key_sharding)

        def run_chain(key):
            key_draw, key_state = jax.random.split(key)
            init_flat = self.kernel._draw_init(key_draw)
            state = self.kernel.init_state(key_state, init_flat)

            def warm_step(state, _):
                return self.kernel.sample_step(state), None

            state, _ = jax.lax.scan(
                warm_step, state, None, length=self.warmup_steps
            )

            def samp_step(state, _):
                state = self.kernel.sample_step(state)
                out = {
                    "z": state.z,
                    "diverging": state.diverging,
                    "accept_prob": state.accept_prob,
                    "num_steps": state.num_steps,
                    "step_size": state.adapt.step_size,
                    "energy": state.energy,
                }
                return state, out

            state, collected = jax.lax.scan(
                samp_step, state, None, length=self.num_samples
            )
            return state, collected

        run = jax.jit(jax.vmap(run_chain))
        last_state, collected = run(chain_keys)
        self._last_state = last_state

        # thinning
        z = collected["z"][:, :: self.thinning]  # (C, S, dim)

        # unconstrain -> constrained site dict (vmapped postprocess)
        unravel = self.kernel._unravel
        postprocess = self.kernel.postprocess_fn

        def post_one(flat):
            return postprocess(unravel(flat))

        flat2 = z.reshape((-1, z.shape[-1]))
        constrained = jax.jit(jax.vmap(post_one))(flat2)
        self._samples = {
            name: v.reshape((self.num_chains, -1) + v.shape[1:])
            for name, v in constrained.items()
        }
        self._diagnostics_extra = {
            k: collected[k][:, :: self.thinning]
            for k in ("diverging", "accept_prob", "num_steps", "step_size", "energy")
        }
        return self

    # -- results ------------------------------------------------------------------
    def get_samples(self, num_samples: Optional[int] = None, group_by_chain: bool = False):
        """Ref ``api.py:601``."""
        if self._samples is None:
            raise RuntimeError("no samples: call .run() first")
        samples = self._samples
        if not group_by_chain:
            samples = {
                k: v.reshape((-1,) + v.shape[2:]) for k, v in samples.items()
            }
        if num_samples is not None:
            samples = {k: v[:num_samples] for k, v in samples.items()}
        return samples

    @property
    def last_state(self):
        return self._last_state

    def diagnostics(self) -> Dict:
        """Per-site n_eff and r_hat (ref ``api.py:630``, ``mcmc/util.py:507``)."""
        out = {}
        for name, v in self._samples.items():
            flat = v.reshape(v.shape[:2] + (-1,))
            n_eff = jnp.stack(
                [
                    effective_sample_size(flat[..., i])
                    for i in range(flat.shape[-1])
                ]
            ).reshape(v.shape[2:] or (1,))
            r_hat = jnp.stack(
                [
                    split_gelman_rubin(flat[..., i])
                    for i in range(flat.shape[-1])
                ]
            ).reshape(v.shape[2:] or (1,))
            out[name] = {"n_eff": n_eff, "r_hat": r_hat}
        out["divergences"] = {
            "total": int(
                np.asarray(self._diagnostics_extra["diverging"]).sum()
            )
        }
        out["acceptance rate"] = {
            "mean": float(
                np.asarray(self._diagnostics_extra["accept_prob"]).mean()
            )
        }
        return out

    def summary(self, prob: float = 0.9):
        """Print a summary table (ref ``mcmc/util.py:531-618``)."""
        samples = self._samples
        diag = self.diagnostics()
        header = (
            f"{'':>16} {'mean':>9} {'std':>9} {'median':>9} "
            f"{f'{prob*100:.1f}%':>9} {'n_eff':>9} {'r_hat':>7}"
        )
        print(header)
        for name, v in samples.items():
            flat = np.asarray(v).reshape((-1,) + v.shape[2:])
            flat2 = flat.reshape(flat.shape[0], -1)
            n_eff = np.asarray(diag[name]["n_eff"]).reshape(-1)
            r_hat = np.asarray(diag[name]["r_hat"]).reshape(-1)
            for i in range(flat2.shape[1]):
                sub = f"{name}[{i}]" if flat2.shape[1] > 1 else name
                col = flat2[:, i]
                lo, hi = np.quantile(col, [(1 - prob) / 2, (1 + prob) / 2])
                print(
                    f"{sub:>16} {col.mean():>9.3f} {col.std():>9.3f} "
                    f"{np.median(col):>9.3f} "
                    f"[{lo:>7.2f}, {hi:>7.2f}] {n_eff[i]:>9.1f} "
                    f"{r_hat[i]:>7.3f}"
                )
        print(
            f"\nNumber of divergences: {diag['divergences']['total']}"
        )
