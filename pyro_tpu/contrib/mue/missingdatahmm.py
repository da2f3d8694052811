"""Discrete HMM over one-hot observations with missing data (MuE).

Ref ``pyro/contrib/mue/missingdatahmm.py:13`` (``MissingDataDiscreteHMM``).
Observations are one-hot rows; an all-zero row marks missing data (used
for variable-length sequence padding).  Unlike ``DiscreteHMM``, the first
state emits immediately (standard HMM convention ``initial.T @ emission``).

TPU notes: ``log_prob`` eliminates time by the O(log T) pairwise
log-matmul-exp reduction shared with ``DiscreteHMM``; the inherently
sequential algorithms (filter, smooth, Viterbi, FFBS) are single
``lax.scan`` loops over time with batched (K,K) contractions per step.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ...distributions import constraints
from ...distributions.discrete import Categorical, OneHotCategorical
from ...distributions.distribution import Distribution
from ...distributions.hmm import _sequential_logmatmulexp
from ...distributions.util import broadcast_shape


class MissingDataDiscreteHMM(Distribution):
    """Ref ``missingdatahmm.py:13``."""

    arg_constraints = {
        "initial_logits": constraints.real_vector,
        "transition_logits": constraints.independent(constraints.real, 2),
        "observation_logits": constraints.independent(constraints.real, 2),
    }
    support = constraints.independent(constraints.nonnegative, 2)

    def __init__(self, initial_logits, transition_logits, observation_logits):
        initial_logits = jnp.asarray(initial_logits, jnp.result_type(float))
        transition_logits = jnp.asarray(
            transition_logits, initial_logits.dtype
        )
        observation_logits = jnp.asarray(
            observation_logits, initial_logits.dtype
        )
        if initial_logits.ndim < 1:
            raise ValueError("initial_logits needs at least one dim")
        if transition_logits.ndim < 2 or observation_logits.ndim < 2:
            raise ValueError("transition/observation logits need >= 2 dims")
        shape = broadcast_shape(
            initial_logits.shape[:-1],
            transition_logits.shape[:-2],
            observation_logits.shape[:-2],
        )
        if len(shape) == 0:
            shape = (1,)
        batch_shape = shape
        event_shape = (1, observation_logits.shape[-1])
        self.initial_logits = initial_logits - logsumexp(
            initial_logits, -1, keepdims=True
        )
        self.transition_logits = transition_logits - logsumexp(
            transition_logits, -1, keepdims=True
        )
        self.observation_logits = observation_logits - logsumexp(
            observation_logits, -1, keepdims=True
        )
        super().__init__(batch_shape, event_shape)

    def _value_logits(self, value):
        """Per-step emission log-likelihoods; missing rows (all zeros)
        contribute 0."""
        return jnp.matmul(
            value, jnp.swapaxes(self.observation_logits, -2, -1)
        )

    def log_prob(self, value):
        """``value``: one-hot (batch, T, B); zero rows = missing."""
        assert value.shape[-1] == self.event_shape[1]
        value_logits = self._value_logits(value)
        if value.shape[-2] == 1:
            result = self.initial_logits + value_logits[..., 0, :]
            return logsumexp(result, -1)
        result = (
            self.transition_logits[..., None, :, :]
            + value_logits[..., 1:, None, :]
        )
        result = _sequential_logmatmulexp(result)
        result = (
            self.initial_logits
            + value_logits[..., 0, :]
            + logsumexp(result, -1)
        )
        return logsumexp(result, -1)

    def sample(self, key, sample_shape=()):
        """Ancestral sampling; last dim of ``sample_shape`` (or the
        distribution's convention) is the number of steps.  Following the
        reference (ref :115), ``sample_shape=(T,)`` with batch from
        ``batch_shape``."""
        shape = broadcast_shape(
            tuple(self.batch_shape) + (1, 1),
            tuple(sample_shape) + (1,),
            (1, 1, self.event_shape[-1]),
        )
        T = shape[-2]
        k_init, k_scan = jax.random.split(key)
        init_logits = jnp.broadcast_to(
            self.initial_logits,
            shape[:-2] + self.initial_logits.shape[-1:],
        )
        state = OneHotCategorical(logits=init_logits).sample(k_init)

        def step(state, k):
            k_obs, k_next = jax.random.split(k)
            obs_logits = jnp.matmul(
                state[..., None, :], self.observation_logits
            )[..., 0, :]
            obs = OneHotCategorical(logits=obs_logits).sample(k_obs)
            trans_logits = jnp.matmul(
                state[..., None, :], self.transition_logits
            )[..., 0, :]
            state = OneHotCategorical(logits=trans_logits).sample(k_next)
            return state, obs

        _, obs = jax.lax.scan(step, state, jax.random.split(k_scan, T))
        # move time from leading scan axis to axis -2
        return jnp.moveaxis(obs, 0, -2)

    def filter(self, value):
        """Normalized forward messages p(z_t | x_{<=t}) (ref :147)."""
        value_logits = self._value_logits(value)
        trans = self.transition_logits

        f0 = self.initial_logits + value_logits[..., 0, :]
        f0 = f0 - logsumexp(f0, -1, keepdims=True)

        def step(f_prev, v_t):
            f = logsumexp(f_prev[..., :, None] + trans + v_t[..., None, :], -2)
            f = f - logsumexp(f, -1, keepdims=True)
            return f, f

        vs = jnp.moveaxis(value_logits[..., 1:, :], -2, 0)
        _, fs = jax.lax.scan(step, f0, vs)
        fs = jnp.moveaxis(fs, 0, -2)
        return jnp.concatenate([f0[..., None, :], fs], axis=-2)

    def smooth(self, value):
        """Posterior marginals p(z_t | x_{1:T}) (ref :188)."""
        filt = self.filter(value)
        value_logits = self._value_logits(value)
        trans = self.transition_logits

        def back_step(b_next, v_t):
            b = logsumexp(
                b_next[..., None, :] + trans + v_t[..., None, :], -1
            )
            return b, b

        vs = jnp.moveaxis(value_logits[..., 1:, :], -2, 0)[::-1]
        bT = jnp.zeros(filt.shape[:-2] + filt.shape[-1:])
        _, bs = jax.lax.scan(back_step, bT, vs)
        bs = jnp.moveaxis(bs[::-1], 0, -2)
        backfilter = jnp.concatenate([bs, bT[..., None, :]], axis=-2)
        smooth = filt + backfilter
        return smooth - logsumexp(smooth, -1, keepdims=True)

    def sample_states(self, key, value):
        """Forward-filter backward-sample state trajectory (ref :220)."""
        filt = self.filter(value)
        T = filt.shape[-2]
        trans = self.transition_logits
        k_last, k_scan = jax.random.split(key)
        last = Categorical(logits=filt[..., -1, :]).sample(k_last)

        K = trans.shape[-1]

        def back(carry, inp):
            f_t, k = inp
            state = carry
            # trans[..., :, state] via one-hot contraction (batch-safe)
            trans_col = jnp.einsum(
                "...ij,...j->...i", trans, jax.nn.one_hot(state, K)
            )
            logits = f_t + trans_col
            prev = Categorical(logits=logits).sample(k)
            return prev, prev

        fs = jnp.moveaxis(filt[..., :-1, :], -2, 0)[::-1]
        keys = jax.random.split(k_scan, T - 1)
        _, prevs = jax.lax.scan(back, last, (fs, keys))
        states = jnp.concatenate(
            [jnp.moveaxis(prevs[::-1], 0, -1), last[..., None]], axis=-1
        )
        return states

    def map_states(self, value):
        """Viterbi MAP state trajectory (ref :244)."""
        value_logits = self._value_logits(value)
        trans = self.transition_logits
        s0 = self.initial_logits + value_logits[..., 0, :]

        def fwd(s_prev, v_t):
            w = s_prev[..., :, None] + trans + v_t[..., None, :]
            s = jnp.max(w, axis=-2)
            tb = jnp.argmax(w, axis=-2)
            return s, (s, tb)

        vs = jnp.moveaxis(value_logits[..., 1:, :], -2, 0)
        s_last, (ss, tbs) = jax.lax.scan(fwd, s0, vs)
        last = jnp.argmax(s_last, -1)

        def back(state, tb_t):
            prev = jnp.take_along_axis(tb_t, state[..., None], axis=-1)[
                ..., 0
            ]
            return prev, prev

        _, prevs = jax.lax.scan(back, last, tbs[::-1])
        states = jnp.concatenate(
            [jnp.moveaxis(prevs[::-1], 0, -1), last[..., None]], axis=-1
        )
        return states

    def given_states(self, states):
        """Emission distribution conditioned on a state trajectory
        (ref :290)."""
        shape = broadcast_shape(
            tuple(self.batch_shape) + (1, 1),
            tuple(states.shape[:-1]) + (1, 1),
            (1, 1, self.observation_logits.shape[-1]),
        )
        obs_logits = jnp.broadcast_to(
            self.observation_logits,
            shape[:-2] + self.observation_logits.shape[-2:],
        )
        idx = jnp.broadcast_to(
            states[..., None], states.shape + (shape[-1],)
        )
        logits = jnp.take_along_axis(obs_logits, idx, axis=-2)
        return OneHotCategorical(logits=logits)

    def sample_given_states(self, key, states):
        """Ref :308."""
        return self.given_states(states).sample(key)
