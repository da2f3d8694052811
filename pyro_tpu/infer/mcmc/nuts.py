"""No-U-Turn Sampler with multinomial sampling, fully jittable.

Ref ``pyro/infer/mcmc/nuts.py:55`` (iterative ``_build_tree`` doubling) and
Hoffman & Gelman (2011), with Stan's generalized termination criterion and
biased progressive (multinomial) sampling.

TPU-native design: the recursion-free subtree builder runs 2^depth leapfrog
steps inside a ``lax.while_loop``, using an O(max_depth) checkpoint array to
detect sub-U-turns: leaf ``k`` (0-indexed) *starts* balanced subtrees when
even — its momentum is stored at checkpoint index ``popcount(k >> 1)`` —
and *completes* ``trailing_ones(k)`` subtrees when odd, which are checked
against checkpoints ``[idx_max - trailing_ones(k) + 1, idx_max]``.  The
outer doubling is a second while_loop.  Everything is fixed-shape, so
chains vmap and shard (P4 in SURVEY §2.8).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .hmc import HMC, HMCState, _kinetic, _leapfrog, _sample_momentum


class _TreeState(NamedTuple):
    # trajectory extremes
    z_left: jnp.ndarray
    r_left: jnp.ndarray
    grad_left: jnp.ndarray
    pe_left: jnp.ndarray
    z_right: jnp.ndarray
    r_right: jnp.ndarray
    grad_right: jnp.ndarray
    pe_right: jnp.ndarray
    # multinomial proposal
    z_proposal: jnp.ndarray
    pe_proposal: jnp.ndarray
    grad_proposal: jnp.ndarray
    # statistics
    r_sum: jnp.ndarray
    weight: jnp.ndarray  # log total weight relative to H0
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    num_proposals: jnp.ndarray
    depth: jnp.ndarray
    rng_key: jnp.ndarray


def _popcount(x):
    return jax.lax.population_count(x.astype(jnp.uint32)).astype(jnp.int32)


def _trailing_ones(x):
    x = x.astype(jnp.uint32)
    return jax.lax.population_count(x & ~(x + 1)).astype(jnp.int32)


def _is_turning(inverse_mass_diag, r_left, r_right, r_sum):
    """Generalized U-turn criterion (Betancourt): velocity at both trajectory
    ends must have positive projection on the trajectory's momentum sum."""
    v_left = inverse_mass_diag * r_left
    v_right = inverse_mass_diag * r_right
    return (jnp.dot(v_left, r_sum) <= 0) | (jnp.dot(v_right, r_sum) <= 0)


class NUTS(HMC):
    """Ref ``pyro/infer/mcmc/nuts.py:55``."""

    def __init__(
        self,
        model=None,
        potential_fn=None,
        step_size: float = 1.0,
        adapt_step_size: bool = True,
        adapt_mass_matrix: bool = True,
        full_mass: bool = False,
        use_multinomial_sampling: bool = True,
        max_tree_depth: int = 10,
        target_accept_prob: float = 0.8,
        max_plate_nesting=None,
        jit_compile=True,
        ignore_jit_warnings=True,
        init_strategy: str = "uniform",
        init_values=None,
    ):
        super().__init__(
            model=model,
            potential_fn=potential_fn,
            step_size=step_size,
            num_steps=1,
            adapt_step_size=adapt_step_size,
            adapt_mass_matrix=adapt_mass_matrix,
            full_mass=full_mass,
            target_accept_prob=target_accept_prob,
            max_plate_nesting=max_plate_nesting,
            init_strategy=init_strategy,
            init_values=init_values,
        )
        self.max_tree_depth = max_tree_depth
        self.use_multinomial_sampling = use_multinomial_sampling

    # -- subtree builder ---------------------------------------------------------
    def _build_subtree(
        self,
        depth,
        z,
        r,
        z_grad,
        energy0,
        direction,
        step_size,
        inverse_mass_diag,
        rng_key,
    ):
        """Build a balanced subtree of 2^depth leaves starting one leapfrog
        step beyond (z, r) in ``direction``.  Returns a _TreeState for the
        subtree (left = first leaf produced, right = last leaf produced)."""
        n_dim = z.shape[0]
        max_num = jnp.asarray(2**depth if isinstance(depth, int) else 0)
        num_leaves = jnp.left_shift(1, depth)  # 2^depth, traced
        signed_step = direction * step_size
        D = self.max_tree_depth

        r_ckpts = jnp.zeros((D + 1, n_dim))
        r_sum_ckpts = jnp.zeros((D + 1, n_dim))

        def cond(carry):
            k, tree, _z, _r, _pe, _grad, _ck, _cks = carry
            return (k < num_leaves) & ~tree.turning & ~tree.diverging

        def body(carry):
            k, tree, z_cur, r_cur, pe_cur, grad_cur, r_ckpts, r_sum_ckpts = carry
            key, key_u = jax.random.split(tree.rng_key)
            z_new, r_new, pe_new, grad_new = _leapfrog(
                z_cur, r_cur, grad_cur, signed_step, inverse_mass_diag,
                self.potential_fn,
            )
            energy_new = pe_new + _kinetic(r_new, inverse_mass_diag)
            delta = energy_new - energy0
            delta = jnp.where(jnp.isnan(delta), jnp.inf, delta)
            diverging = delta > 1000.0
            log_w_leaf = -delta
            if self.use_multinomial_sampling:
                weight_new = jnp.logaddexp(tree.weight, log_w_leaf)
                take = (
                    jnp.log(jax.random.uniform(key_u))
                    < log_w_leaf - weight_new
                )
            else:
                # slice sampling variant: weight counts leaves in the slice
                weight_new = jnp.logaddexp(tree.weight, log_w_leaf)
                take = (
                    jnp.log(jax.random.uniform(key_u)) < log_w_leaf - weight_new
                )
            z_prop = jnp.where(take, z_new, tree.z_proposal)
            pe_prop = jnp.where(take, pe_new, tree.pe_proposal)
            grad_prop = jnp.where(take, grad_new, tree.grad_proposal)

            # checkpoint storage for even leaves
            ck_idx = _popcount(k >> 1)
            is_even = (k % 2) == 0
            r_ckpts = jnp.where(
                is_even,
                r_ckpts.at[ck_idx].set(r_new),
                r_ckpts,
            )
            r_sum_ckpts = jnp.where(
                is_even,
                r_sum_ckpts.at[ck_idx].set(tree.r_sum),
                r_sum_ckpts,
            )
            r_sum_new = tree.r_sum + r_new

            # sub-U-turn checks for odd leaves over completed subtrees
            idx_max = ck_idx
            idx_min = idx_max - _trailing_ones(k) + 1

            # UNROLLED over the static checkpoint depth: a lax.fori_loop
            # here lowers to a nested while_loop INSIDE the per-leapfrog
            # while body — D+1 extra sequential loop-latency hits per
            # leapfrog on a body that is ~3 VPU ops; unrolling lets XLA
            # fuse all checks into the leapfrog body (the checks are
            # independent given r_sum_new)
            turning = jnp.zeros((), bool)
            for j in range(D + 1):
                in_range = (j >= idx_min) & (j <= idx_max) & ((k % 2) == 1)
                rho = r_sum_new - r_sum_ckpts[j]
                t = _is_turning(
                    inverse_mass_diag, r_ckpts[j], r_new, rho
                )
                turning = turning | (in_range & t)

            new_tree = _TreeState(
                jnp.where(k == 0, z_new, tree.z_left),
                jnp.where(k == 0, r_new, tree.r_left),
                jnp.where(k == 0, grad_new, tree.grad_left),
                jnp.where(k == 0, pe_new, tree.pe_left),
                z_new,
                r_new,
                grad_new,
                pe_new,
                z_prop,
                pe_prop,
                grad_prop,
                r_sum_new,
                weight_new,
                turning,
                diverging,
                tree.sum_accept
                + jnp.minimum(1.0, jnp.exp(-delta)),
                tree.num_proposals + 1,
                tree.depth,
                key,
            )
            return (
                k + 1,
                new_tree,
                z_new,
                r_new,
                pe_new,
                grad_new,
                r_ckpts,
                r_sum_ckpts,
            )

        zero = jnp.zeros(())
        init_tree = _TreeState(
            z, r, z_grad, zero, z, r, z_grad, zero,
            z, zero, z_grad,
            jnp.zeros_like(r),
            -jnp.inf,
            jnp.zeros((), bool),
            jnp.zeros((), bool),
            zero,
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            rng_key,
        )
        carry = (
            jnp.zeros((), jnp.int32),
            init_tree,
            z,
            r,
            zero,
            z_grad,
            r_ckpts,
            r_sum_ckpts,
        )
        _, tree, *_ = jax.lax.while_loop(cond, body, carry)
        return tree

    # -- main transition ----------------------------------------------------------
    def _trajectory(self, state: HMCState, step_size, inverse_mass_diag, key):
        key, key_mom = jax.random.split(key)
        r0 = _sample_momentum(key_mom, inverse_mass_diag)
        energy0 = state.potential_energy + _kinetic(r0, inverse_mass_diag)

        zero = jnp.zeros(())
        tree = _TreeState(
            state.z, r0, state.z_grad, state.potential_energy,
            state.z, r0, state.z_grad, state.potential_energy,
            state.z, state.potential_energy, state.z_grad,
            r0,
            jnp.zeros(()),  # log weight of the root leaf = 0
            jnp.zeros((), bool),
            jnp.zeros((), bool),
            zero,
            jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
            key,
        )

        def cond(tree):
            return (
                (tree.depth < self.max_tree_depth)
                & ~tree.turning
                & ~tree.diverging
            )

        def body(tree):
            key, key_dir, key_sub, key_take = jax.random.split(
                tree.rng_key, 4
            )
            going_right = jax.random.bernoulli(key_dir)
            direction = jnp.where(going_right, 1.0, -1.0)
            z_edge = jnp.where(going_right, tree.z_right, tree.z_left)
            r_edge = jnp.where(going_right, tree.r_right, tree.r_left)
            grad_edge = jnp.where(
                going_right, tree.grad_right, tree.grad_left
            )
            subtree = self._build_subtree(
                tree.depth,
                z_edge,
                r_edge,
                grad_edge,
                energy0,
                direction,
                step_size,
                inverse_mass_diag,
                key_sub,
            )
            bad_subtree = subtree.turning | subtree.diverging
            # biased progressive sampling: take the new subtree's proposal
            # with prob min(1, w_new / w_old)
            take_new = (
                jnp.log(jax.random.uniform(key_take))
                < subtree.weight - tree.weight
            ) & ~bad_subtree
            z_prop = jnp.where(take_new, subtree.z_proposal, tree.z_proposal)
            pe_prop = jnp.where(
                take_new, subtree.pe_proposal, tree.pe_proposal
            )
            grad_prop = jnp.where(
                take_new, subtree.grad_proposal, tree.grad_proposal
            )
            # merged extremes (only meaningful if subtree is good)
            z_left = jnp.where(going_right, tree.z_left, subtree.z_right)
            r_left = jnp.where(going_right, tree.r_left, subtree.r_right)
            grad_left = jnp.where(
                going_right, tree.grad_left, subtree.grad_right
            )
            pe_left = jnp.where(going_right, tree.pe_left, subtree.pe_right)
            z_right = jnp.where(going_right, subtree.z_right, tree.z_right)
            r_right = jnp.where(going_right, subtree.r_right, tree.r_right)
            grad_right = jnp.where(
                going_right, subtree.grad_right, tree.grad_right
            )
            pe_right = jnp.where(
                going_right, subtree.pe_right, tree.pe_right
            )
            r_sum = tree.r_sum + subtree.r_sum
            turning_merged = _is_turning(
                inverse_mass_diag, r_left, r_right, r_sum
            )
            turning = bad_subtree | subtree.turning | turning_merged
            return _TreeState(
                z_left, r_left, grad_left, pe_left,
                z_right, r_right, grad_right, pe_right,
                z_prop, pe_prop, grad_prop,
                r_sum,
                jnp.logaddexp(tree.weight, subtree.weight),
                turning & ~subtree.diverging,
                tree.diverging | subtree.diverging,
                tree.sum_accept + subtree.sum_accept,
                tree.num_proposals + subtree.num_proposals,
                tree.depth + 1,
                key,
            )

        tree = jax.lax.while_loop(cond, body, tree)

        accept_prob = tree.sum_accept / jnp.maximum(tree.num_proposals, 1)
        num_steps = tree.num_proposals
        energy_new = tree.pe_proposal + _kinetic(r0, inverse_mass_diag)
        return (
            tree.z_proposal,
            tree.pe_proposal,
            tree.grad_proposal,
            energy_new,
            num_steps,
            accept_prob,
            tree.diverging,
        )
