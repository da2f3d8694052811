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
        hook_fn: Optional[Callable] = None,
        mp_context=None,  # accepted; meaningless without process pools
        disable_progbar: bool = True,
        disable_validation: bool = True,
        transforms=None,
        save_params=None,
        chain_method: str = "vectorized",
        thinning: int = 1,
    ):
        """Deviations from the reference's signature, all documented:

        - ``hook_fn(kernel, params, stage, i)`` is called from inside the
          compiled scan via ``jax.debug.callback``; under the vmapped
          chain axis it fires once per chain per step with that chain's
          (unbatched) params.
        - ``mp_context`` is accepted for API parity and warned about:
          chains are a vmapped axis, not OS processes.
        - ``disable_progbar`` defaults to True (a per-draw host callback
          through the device tunnel is expensive); set False to stream
          coarse progress lines.
        - ``chain_method``: "vectorized" (vmap, default), "sequential"
          (Python loop — lower peak memory), or "parallel" (chain axis
          sharded over available devices, as in
          ``pyro_tpu.parallel.sharded_chain_mcmc``).
        """
        if chain_method not in ("vectorized", "sequential", "parallel"):
            raise ValueError(
                f"unknown chain_method={chain_method!r}; expected "
                "'vectorized', 'sequential' or 'parallel'"
            )
        if mp_context is not None:
            import logging

            logging.getLogger("pyro_tpu").warning(
                "MCMC(mp_context=...) has no effect: chains run as a "
                "vmapped axis of one compiled program, not as processes"
            )
        self.kernel = kernel
        self.num_samples = num_samples
        self.warmup_steps = (
            num_samples if warmup_steps is None else warmup_steps
        )
        self.num_chains = num_chains
        self.chain_method = chain_method
        self.thinning = thinning
        self.hook_fn = hook_fn
        self.disable_progbar = disable_progbar
        self.save_params = tuple(save_params) if save_params else None
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
        # (set by pyro_tpu.parallel.sharded_chain_mcmc, or
        # chain_method="parallel")
        key_sharding = getattr(self, "_key_sharding", None)
        if key_sharding is None and self.chain_method == "parallel":
            devices = jax.devices()
            if len(devices) > 1 and self.num_chains % len(devices) == 0:
                from jax.sharding import (
                    Mesh,
                    NamedSharding,
                    PartitionSpec,
                )

                mesh = Mesh(np.asarray(devices), ("chain",))
                key_sharding = NamedSharding(mesh, PartitionSpec("chain"))
        if key_sharding is not None:
            chain_keys = jax.device_put(chain_keys, key_sharding)

        hook_fn = self.hook_fn
        progbar = not self.disable_progbar
        kernel = self.kernel
        report_every = max(1, (self.warmup_steps + self.num_samples) // 20)

        def _host_report(stage, i, params):
            if hook_fn is not None:
                hook_fn(kernel, params, stage, int(i))
            if progbar and int(i) % report_every == 0:
                import logging

                total = (
                    self.warmup_steps
                    if stage == "warmup"
                    else self.num_samples
                )
                logging.getLogger("pyro_tpu").info(
                    "MCMC %s %d/%d", stage, int(i), total
                )

        def _maybe_callback(stage, i, state):
            """Stream hook_fn/progress from inside the compiled scan.
            Fires ONE host callback per step; with vectorized chains the
            params carry a leading chain axis (all chains' stats in one
            callback, not num_chains callbacks per step)."""
            if hook_fn is None and not progbar:
                return
            if hook_fn is not None:
                z = state.z
                if z.ndim == 2:  # batched over chains
                    params = jax.vmap(
                        lambda f: self.kernel.postprocess_fn(
                            self.kernel._unravel(f)
                        )
                    )(z)
                else:
                    params = self.kernel.postprocess_fn(
                        self.kernel._unravel(z)
                    )
            else:
                params = {}
            import functools

            jax.debug.callback(
                functools.partial(_host_report, stage), i, params
            )

        def run_chain(key):
            key_draw, key_state = jax.random.split(key)
            init_flat = self.kernel._draw_init(key_draw)
            state = self.kernel.init_state(key_state, init_flat)

            def warm_step(state, i):
                state = self.kernel.sample_step(state)
                _maybe_callback("warmup", i, state)
                return state, None

            state, _ = jax.lax.scan(
                warm_step, state, jnp.arange(self.warmup_steps)
            )

            def samp_step(state, i):
                state = self.kernel.sample_step(state)
                _maybe_callback("sample", i, state)
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
                samp_step, state, jnp.arange(self.num_samples)
            )
            return state, collected

        if self.chain_method == "sequential":
            # one chain at a time: lower peak memory, same per-chain math
            per_chain = [jax.jit(run_chain)(k) for k in chain_keys]
            last_state = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[s for s, _ in per_chain]
            )
            collected = jax.tree.map(
                lambda *xs: jnp.stack(xs), *[c for _, c in per_chain]
            )
        elif hook_fn is None and not progbar:
            run = jax.jit(jax.vmap(run_chain))
            last_state, collected = run(chain_keys)
        else:
            # callback-active vectorized path: scan over steps of a
            # vmapped kernel step, so _maybe_callback fires once per
            # step with all chains batched (steps callbacks total,
            # not steps * chains)
            def init_chain(key):
                key_draw, key_state = jax.random.split(key)
                return self.kernel.init_state(
                    key_state, self.kernel._draw_init(key_draw)
                )

            def run_all(keys):
                states = jax.vmap(init_chain)(keys)

                def warm_step(states, i):
                    states = jax.vmap(self.kernel.sample_step)(states)
                    _maybe_callback("warmup", i, states)
                    return states, None

                states, _ = jax.lax.scan(
                    warm_step, states, jnp.arange(self.warmup_steps)
                )

                def samp_step(states, i):
                    states = jax.vmap(self.kernel.sample_step)(states)
                    _maybe_callback("sample", i, states)
                    out = {
                        "z": states.z,
                        "diverging": states.diverging,
                        "accept_prob": states.accept_prob,
                        "num_steps": states.num_steps,
                        "step_size": states.adapt.step_size,
                        "energy": states.energy,
                    }
                    return states, out

                states, collected = jax.lax.scan(
                    samp_step, states, jnp.arange(self.num_samples)
                )
                # scan stacks over steps: (S, C, ...) -> (C, S, ...)
                collected = jax.tree.map(
                    lambda x: jnp.swapaxes(x, 0, 1), collected
                )
                return states, collected

            last_state, collected = jax.jit(run_all)(chain_keys)
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
            if self.save_params is None or name in self.save_params
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
