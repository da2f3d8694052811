"""Hamiltonian Monte Carlo as a jittable state machine.

Ref ``pyro/infer/mcmc/hmc.py:21`` (HMC kernel, ``_find_reasonable_step_size
:170``, ``sample:371``) and ``adaptation.py:23`` (Stan-style warmup windows).

TPU-native design: the kernel is a pair of pure functions
``init(rng_key, params) -> HMCState`` and ``sample_step(state) -> state``
over flat unconstrained vectors, so chains vmap trivially (P4 in SURVEY
§2.8) and a whole run is one ``lax.scan``.  Warmup adaptation (dual-
averaging step size + Welford diagonal mass) is part of the carried state;
window boundaries are static arrays indexed by the iteration counter.
"""

from __future__ import annotations

import math
from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.flatten_util
import jax.numpy as jnp

from ...ops.dual_averaging import DAState, da_init, da_step
from ...ops.welford import WelfordState, welford_covariance, welford_init, welford_update
from .mcmc_kernel import MCMCKernel
from .util import initialize_model


class AdaptState(NamedTuple):
    step_size: jnp.ndarray
    inverse_mass_diag: jnp.ndarray
    da: DAState
    welford: WelfordState


class HMCState(NamedTuple):
    i: jnp.ndarray
    z: jnp.ndarray  # flat unconstrained position
    potential_energy: jnp.ndarray
    z_grad: jnp.ndarray
    energy: jnp.ndarray
    num_steps: jnp.ndarray
    accept_prob: jnp.ndarray
    mean_accept_prob: jnp.ndarray
    diverging: jnp.ndarray
    adapt: AdaptState
    rng_key: jnp.ndarray


def _leapfrog(z, r, z_grad, step_size, inverse_mass_diag, potential_fn):
    """One velocity-verlet step on flat vectors."""
    r = r - 0.5 * step_size * z_grad
    z = z + step_size * inverse_mass_diag * r
    pe, z_grad = jax.value_and_grad(potential_fn)(z)
    r = r - 0.5 * step_size * z_grad
    return z, r, pe, z_grad


def _kinetic(r, inverse_mass_diag):
    return 0.5 * jnp.sum(inverse_mass_diag * r * r)


def _sample_momentum(key, inverse_mass_diag):
    eps = jax.random.normal(key, inverse_mass_diag.shape)
    return eps * jax.lax.rsqrt(inverse_mass_diag)


def build_adaptation_schedule(num_warmup: int):
    """Stan-style three-phase schedule (ref ``adaptation.py:100-160``):
    initial fast window (step size only), doubling slow windows (mass),
    terminal fast window.  Returns boolean numpy arrays of length
    num_warmup: (update_mass_at_end, is_slow_window)."""
    import numpy as np

    adapt_mass = np.zeros(num_warmup, dtype=bool)  # True at window ends
    in_slow = np.zeros(num_warmup, dtype=bool)
    if num_warmup <= 0:
        return jnp.asarray(adapt_mass), jnp.asarray(in_slow)
    if num_warmup < 20:
        return jnp.asarray(adapt_mass), jnp.asarray(in_slow)
    start_buffer, end_buffer, init_window = 75, 50, 25
    if num_warmup < start_buffer + end_buffer + init_window:
        start_buffer = int(0.15 * num_warmup)
        end_buffer = int(0.1 * num_warmup)
        init_window = num_warmup - start_buffer - end_buffer
    pos = start_buffer
    window = init_window
    while pos < num_warmup - end_buffer:
        end = min(pos + window, num_warmup - end_buffer)
        # last window absorbs the remainder
        if end + 2 * window > num_warmup - end_buffer:
            end = num_warmup - end_buffer
        in_slow[pos:end] = True
        adapt_mass[end - 1] = True
        pos = end
        window *= 2
    return jnp.asarray(adapt_mass), jnp.asarray(in_slow)


def find_reasonable_step_size(
    potential_fn, z, pe, z_grad, inverse_mass_diag, rng_key, target=0.8
):
    """Double/halve until the one-step accept prob crosses the target
    (ref ``hmc.py:170-220``)."""

    def accept_prob(step_size, key):
        r = _sample_momentum(key, inverse_mass_diag)
        energy0 = pe + _kinetic(r, inverse_mass_diag)
        z1, r1, pe1, _ = _leapfrog(
            z, r, z_grad, step_size, inverse_mass_diag, potential_fn
        )
        energy1 = pe1 + _kinetic(r1, inverse_mass_diag)
        delta = energy0 - energy1
        return jnp.where(jnp.isfinite(delta), jnp.minimum(jnp.exp(delta), 1.0), 0.0)

    key0, key_loop = jax.random.split(rng_key)
    ap0 = accept_prob(1.0, key0)
    direction = jnp.where(ap0 > target, 1.0, -1.0)

    def cond(state):
        step_size, i, key = state
        k1, _ = jax.random.split(key)
        ap = accept_prob(step_size, k1)
        crossed = jnp.where(direction > 0, ap <= target, ap >= target)
        in_range = (step_size > 1e-10) & (step_size < 1e7)
        return (~crossed) & (i < 100) & in_range

    def body(state):
        step_size, i, key = state
        _, key = jax.random.split(key)
        return step_size * jnp.exp2(direction), i + 1, key

    step_size, _, _ = jax.lax.while_loop(
        cond, body, (jnp.asarray(1.0), jnp.zeros((), jnp.int32), key_loop)
    )
    return step_size


class HMC(MCMCKernel):
    """Ref ``pyro/infer/mcmc/hmc.py:21``."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        step_size: float = 1.0,
        trajectory_length: Optional[float] = None,
        num_steps: Optional[int] = None,
        adapt_step_size: bool = True,
        adapt_mass_matrix: bool = True,
        full_mass: bool = False,
        target_accept_prob: float = 0.8,
        max_plate_nesting=None,
        jit_compile=True,
        ignore_jit_warnings=True,
        init_strategy: str = "uniform",
        init_values=None,
    ):
        if model is None and potential_fn is None:
            raise ValueError("HMC requires a model or a potential_fn")
        self.model = model
        self._given_potential_fn = potential_fn
        self.step_size = step_size
        if trajectory_length is None and num_steps is None:
            trajectory_length = 2 * math.pi
        self.trajectory_length = trajectory_length
        self.num_steps = num_steps
        self.adapt_step_size = adapt_step_size
        self.adapt_mass_matrix = adapt_mass_matrix
        self.full_mass = full_mass
        self.target_accept_prob = target_accept_prob
        self.max_plate_nesting = max_plate_nesting
        self.init_strategy = init_strategy
        self.init_values = init_values
        # filled by setup()
        self.potential_fn = None
        self.postprocess_fn = None
        self._unravel = None
        self._num_warmup = 0

    # -- setup -----------------------------------------------------------------
    def setup(self, warmup_steps, *args, rng_key=None, init_params=None, **kwargs):
        self._num_warmup = warmup_steps
        if self.model is not None:
            info = initialize_model(
                self.model,
                args,
                kwargs,
                init_strategy=self.init_strategy,
                init_params=init_params,
                init_values=self.init_values,
                rng_key=rng_key,
                max_plate_nesting=self.max_plate_nesting,
            )
            dict_potential = info.potential_fn
            self.postprocess_fn = info.postprocess_fn
            init_dict = info.initial_params
        else:
            dict_potential = self._given_potential_fn
            self.postprocess_fn = lambda z, **kw: z
            init_dict = init_params
            if init_dict is None:
                raise ValueError("potential_fn mode requires init_params")
        flat0, unravel = jax.flatten_util.ravel_pytree(init_dict)
        self._unravel = unravel
        self.potential_fn = lambda flat: dict_potential(unravel(flat))
        self._initial_flat = flat0

        # per-chain init draws: re-run the valid-init search per key
        from .util import _find_valid_initial_params

        def _draw_init(key):
            params, _ = _find_valid_initial_params(
                dict_potential, unravel(flat0), key, init_strategy="uniform"
            )
            return jax.flatten_util.ravel_pytree(params)[0]

        self._draw_init = _draw_init
        (
            self._adapt_mass_at,
            self._in_slow_window,
        ) = build_adaptation_schedule(warmup_steps)
        return self

    @property
    def initial_params(self):
        return self._initial_flat

    def init_state(self, rng_key, initial_flat=None) -> HMCState:
        z = self._initial_flat if initial_flat is None else initial_flat
        pe, z_grad = jax.value_and_grad(self.potential_fn)(z)
        inverse_mass_diag = jnp.ones_like(z)
        key_ss, key_state = jax.random.split(rng_key)
        if self.adapt_step_size:
            step_size = find_reasonable_step_size(
                self.potential_fn,
                z,
                pe,
                z_grad,
                inverse_mass_diag,
                key_ss,
                self.target_accept_prob,
            )
        else:
            step_size = jnp.asarray(self.step_size, jnp.float32)
        da = da_init(prox_center=jnp.log(10.0 * step_size))
        welford = welford_init(z.shape[0], diagonal=True)
        adapt = AdaptState(step_size, inverse_mass_diag, da, welford)
        zero = jnp.zeros(())
        return HMCState(
            jnp.zeros((), jnp.int32),
            z,
            pe,
            z_grad,
            pe,
            jnp.zeros((), jnp.int32),
            zero,
            zero,
            jnp.zeros((), bool),
            adapt,
            key_state,
        )

    # -- one transition -------------------------------------------------------
    def _trajectory(self, state: HMCState, step_size, inverse_mass_diag, key):
        """Fixed-length trajectory + MH accept.  Returns
        (z, pe, z_grad, energy, num_steps, accept_prob, diverging, key)."""
        key_mom, key_mh = jax.random.split(key)
        r = _sample_momentum(key_mom, inverse_mass_diag)
        energy0 = state.potential_energy + _kinetic(r, inverse_mass_diag)
        if self.num_steps is not None:
            num_steps = self.num_steps
        else:
            num_steps_f = jnp.ceil(self.trajectory_length / step_size)
            num_steps = jnp.clip(num_steps_f, 1, 1024).astype(jnp.int32)

        def body(i, carry):
            z, r, pe, z_grad = carry
            z, r, pe, z_grad = _leapfrog(
                z, r, z_grad, step_size, inverse_mass_diag, self.potential_fn
            )
            return z, r, pe, z_grad

        z, r, pe, z_grad = jax.lax.fori_loop(
            0,
            num_steps,
            body,
            (state.z, r, state.potential_energy, state.z_grad),
        )
        energy1 = pe + _kinetic(r, inverse_mass_diag)
        delta = energy1 - energy0
        delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
        diverging = delta > 1000.0
        accept_prob = jnp.minimum(1.0, jnp.exp(-delta))
        accept = jax.random.uniform(key_mh) < accept_prob
        z_new = jnp.where(accept, z, state.z)
        pe_new = jnp.where(accept, pe, state.potential_energy)
        grad_new = jnp.where(accept, z_grad, state.z_grad)
        energy_new = jnp.where(accept, energy1, energy0)
        return (
            z_new,
            pe_new,
            grad_new,
            energy_new,
            jnp.asarray(num_steps, jnp.int32)
            if not isinstance(num_steps, jnp.ndarray)
            else num_steps,
            accept_prob,
            diverging,
        )

    def _adapt(self, state: HMCState, accept_prob, z_new) -> AdaptState:
        """Warmup adaptation update (no-op after warmup)."""
        adapt = state.adapt
        i = state.i
        in_warmup = i < self._num_warmup

        # dual-averaging step size
        if self.adapt_step_size:
            da = da_step(adapt.da, self.target_accept_prob - accept_prob)
            step_size_adapting = jnp.exp(da.x_t)
            step_size_final = jnp.exp(da.x_avg)
            is_last = i == (self._num_warmup - 1)
            step_size = jnp.where(
                in_warmup,
                jnp.where(is_last, step_size_final, step_size_adapting),
                adapt.step_size,
            )
            da = jax.tree.map(
                lambda new, old: jnp.where(in_warmup, new, old), da, adapt.da
            )
        else:
            da = adapt.da
            step_size = adapt.step_size

        # mass matrix via Welford over slow windows
        if self.adapt_mass_matrix and self._num_warmup > 0:
            in_slow = (
                self._in_slow_window[jnp.minimum(i, self._num_warmup - 1)]
                & in_warmup
            )
            window_end = (
                self._adapt_mass_at[jnp.minimum(i, self._num_warmup - 1)]
                & in_warmup
            )
            wf_updated = welford_update(adapt.welford, z_new)
            wf = jax.tree.map(
                lambda new, old: jnp.where(in_slow, new, old),
                wf_updated,
                adapt.welford,
            )
            new_inv_mass = welford_covariance(wf)
            inverse_mass_diag = jnp.where(
                window_end, new_inv_mass, adapt.inverse_mass_diag
            )
            # reset welford + restart dual averaging at window end
            wf_reset = welford_init(z_new.shape[0])
            wf = jax.tree.map(
                lambda r, k: jnp.where(window_end, r, k), wf_reset, wf
            )
            if self.adapt_step_size:
                da_restart = da_init(
                    prox_center=jnp.log(10.0 * step_size)
                )
                da = jax.tree.map(
                    lambda r, k: jnp.where(window_end, r, k), da_restart, da
                )
        else:
            wf = adapt.welford
            inverse_mass_diag = adapt.inverse_mass_diag

        return AdaptState(step_size, inverse_mass_diag, da, wf)

    def sample_step(self, state: HMCState) -> HMCState:
        key, key_traj = jax.random.split(state.rng_key)
        (
            z,
            pe,
            z_grad,
            energy,
            num_steps,
            accept_prob,
            diverging,
        ) = self._trajectory(
            state, state.adapt.step_size, state.adapt.inverse_mass_diag,
            key_traj,
        )
        adapt = self._adapt(state, accept_prob, z)
        i = state.i + 1
        n_after_warmup = jnp.maximum(i - self._num_warmup, 1)
        in_warmup = state.i < self._num_warmup
        mean_accept = jnp.where(
            in_warmup,
            state.mean_accept_prob
            + (accept_prob - state.mean_accept_prob) / jnp.maximum(i, 1),
            state.mean_accept_prob
            + (accept_prob - state.mean_accept_prob) / n_after_warmup,
        )
        return HMCState(
            i,
            z,
            pe,
            z_grad,
            energy,
            num_steps,
            accept_prob,
            mean_accept,
            diverging,
            adapt,
            key,
        )

    def get_diagnostics_str(self, state: HMCState) -> str:
        return (
            f"step size {float(state.adapt.step_size):.2e}, "
            f"acc. prob={float(state.mean_accept_prob):.3f}"
        )
