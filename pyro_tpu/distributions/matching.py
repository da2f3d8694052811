"""Random bipartite-matching distributions.

Ref ``pyro/distributions/one_one_matching.py`` (``OneOneMatching:41``)
and ``one_two_matching.py`` (``OneTwoMatching:42``): random matchings
with exact (brute-force permanent) or Bethe-approximate (Sinkhorn
iteration) partition functions, used by ``contrib.tracking`` style
data-association models.

TPU notes: the Sinkhorn iteration is a fixed, statically-unrolled number
of ``logsumexp`` rounds over the (N, N) logit matrix — fully jittable and
differentiable; enumeration is host-side (combinatorial data, not a jit
hot path).
"""

from __future__ import annotations

import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import constraints
from .discrete import Categorical
from .distribution import Distribution

_FINFO = jnp.finfo(jnp.float32)


class OneOneMatchingConstraint(constraints.Constraint):
    """Ref ``one_one_matching.py:18``."""

    event_dim = 1
    is_discrete = True

    def __init__(self, num_nodes):
        self.num_nodes = num_nodes

    def check(self, value):
        if jnp.ndim(value) == 0 or value.shape[-1] != self.num_nodes:
            return jnp.asarray(False)
        in_bounds = (value.min() >= 0) & (value.max() < self.num_nodes)
        counts = jnp.sum(
            jax.nn.one_hot(value, self.num_nodes), axis=-2
        )
        return in_bounds & jnp.all(counts == 1)


class OneTwoMatchingConstraint(constraints.Constraint):
    """Ref ``one_two_matching.py:18``."""

    event_dim = 1
    is_discrete = True

    def __init__(self, num_destins):
        self.num_destins = num_destins
        self.num_sources = 2 * num_destins

    def check(self, value):
        if jnp.ndim(value) == 0 or value.shape[-1] != self.num_sources:
            return jnp.asarray(False)
        in_bounds = (value.min() >= 0) & (value.max() < self.num_destins)
        counts = jnp.sum(
            jax.nn.one_hot(value, self.num_destins), axis=-2
        )
        return in_bounds & jnp.all(counts == 2)


class OneOneMatching(Distribution):
    r"""Random perfect matching of N sources to N destinations
    (ref ``one_one_matching.py:41``).

    ``log p(v) = sum_s logits[s, v[s]] - log Z``.  With ``bp_iters=None``
    the log-permanent is brute-forced over all N! permutations; with
    ``bp_iters=k`` it is the Bethe approximation computed by k Sinkhorn
    rounds (Chertkov et al. 2008; Vontobel 2012).
    """

    arg_constraints = {"logits": constraints.real}
    has_enumerate_support = True

    def __init__(self, logits, *, bp_iters=None):
        logits = jnp.asarray(logits, jnp.result_type(float))
        if logits.ndim != 2:
            raise NotImplementedError(
                "OneOneMatching does not support batching"
            )
        assert bp_iters is None or (
            isinstance(bp_iters, int) and bp_iters > 0
        )
        self.num_nodes, num_nodes = logits.shape
        assert num_nodes == self.num_nodes
        self.logits = logits
        self.bp_iters = bp_iters
        super().__init__((), (self.num_nodes,))

    @property
    def support(self):
        return OneOneMatchingConstraint(self.num_nodes)

    @property
    def log_partition_function(self):
        if self.bp_iters is None:
            d = self.enumerate_support()
            s = jnp.arange(d.shape[-1])
            return jax.scipy.special.logsumexp(
                jnp.sum(self.logits[s, d], -1), -1
            )
        # Sinkhorn mean-field beliefs; gradients flow through the shift
        # (ref :108-131).
        shift = jnp.clip(
            jnp.max(self.logits, 1, keepdims=True), _FINFO.min, _FINFO.max
        )
        logits = self.logits - shift
        d = jax.scipy.special.logsumexp(logits, 0)
        for _ in range(self.bp_iters):
            s = jax.scipy.special.logsumexp(logits - d, -1, keepdims=True)
            d = jax.scipy.special.logsumexp(logits - s, 0)
        b = jnp.exp(logits - (d + s))

        def log(x):
            return jnp.log(jnp.clip(x, _FINFO.tiny))

        b_ = jnp.clip(1 - b, 0)
        logits = jnp.clip(logits, -1 / _FINFO.eps)
        free_energy = jnp.sum(b * (log(b) - logits)) - jnp.sum(
            b_ * log(b_)
        )
        return jnp.sum(shift) - free_energy

    def log_prob(self, value):
        s = jnp.arange(value.shape[-1])
        return (
            jnp.sum(self.logits[s, value], -1)
            - self.log_partition_function
        )

    def enumerate_support(self, expand=True):
        return jnp.asarray(
            list(itertools.permutations(range(self.num_nodes))),
            dtype=jnp.int32,
        )

    def sample(self, key, sample_shape=()):
        if self.bp_iters is None:
            d = self.enumerate_support()
            s = jnp.arange(d.shape[-1])
            logits = jnp.sum(self.logits[s, d], -1)
            idx = Categorical(logits=logits).sample(key, sample_shape)
            return d[idx]
        raise NotImplementedError(
            "OneOneMatching.sample requires bp_iters=None (exact mode)"
        )

    def mode(self):
        """Maximum-weight matching via the Hungarian algorithm
        (ref ``one_one_matching.py:161``)."""
        return maximum_weight_matching(self.logits)


class OneTwoMatching(Distribution):
    r"""Random matching of 2N sources to N destinations where each
    destination matches exactly two sources (ref ``one_two_matching.py:42``).
    """

    arg_constraints = {"logits": constraints.real}
    has_enumerate_support = True

    def __init__(self, logits, *, bp_iters=None):
        logits = jnp.asarray(logits, jnp.result_type(float))
        if logits.ndim != 2:
            raise NotImplementedError(
                "OneTwoMatching does not support batching"
            )
        assert bp_iters is None or (
            isinstance(bp_iters, int) and bp_iters > 0
        )
        self.num_sources, self.num_destins = logits.shape
        assert self.num_sources == 2 * self.num_destins
        self.logits = logits
        self.bp_iters = bp_iters
        super().__init__((), (self.num_sources,))

    @property
    def support(self):
        return OneTwoMatchingConstraint(self.num_destins)

    @property
    def log_partition_function(self):
        if self.bp_iters is None:
            d = self.enumerate_support()
            s = jnp.arange(d.shape[-1])
            return jax.scipy.special.logsumexp(
                jnp.sum(self.logits[s, d], -1), -1
            )
        # Sinkhorn beliefs with destination capacity 2 (ref :109-140).
        shift = jnp.clip(
            jnp.max(self.logits, 1, keepdims=True), _FINFO.min, _FINFO.max
        )
        logits = self.logits - shift
        d = jax.scipy.special.logsumexp(logits, 0) - math.log(2)
        for _ in range(self.bp_iters):
            s = jax.scipy.special.logsumexp(logits - d, -1, keepdims=True)
            d = jax.scipy.special.logsumexp(logits - s, 0) - math.log(2)
        b = jnp.exp(logits - (d + s))

        def log(x):
            return jnp.log(jnp.clip(x, _FINFO.tiny))

        # Bethe free energy adapted to one-two matchings ([4] eqn 4):
        # h2 = entropy of choosing an unordered source pair per destin.
        b_ = jnp.clip(1 - b, 0)
        internal_energy = -jnp.sum(b * jnp.clip(logits, -1 / _FINFO.eps))
        z = b / 2
        h = -jnp.sum(z * log(z), 0)
        h2 = h + log(jnp.expm1(h)) - math.log(2)
        free_energy = (
            internal_energy - jnp.sum(h2) - jnp.sum(b_ * log(b_))
        )
        return jnp.sum(shift) - free_energy

    def log_prob(self, value):
        s = jnp.arange(value.shape[-1])
        return (
            jnp.sum(self.logits[s, value], -1)
            - self.log_partition_function
        )

    def enumerate_support(self, expand=True):
        return jnp.asarray(
            enumerate_one_two_matchings(self.num_destins), dtype=jnp.int32
        )

    def sample(self, key, sample_shape=()):
        if self.bp_iters is None:
            d = self.enumerate_support()
            s = jnp.arange(d.shape[-1])
            logits = jnp.sum(self.logits[s, d], -1)
            idx = Categorical(logits=logits).sample(key, sample_shape)
            return d[idx]
        raise NotImplementedError(
            "OneTwoMatching.sample requires bp_iters=None (exact mode)"
        )

    def mode(self):
        """Maximum-weight matching with duplicated destinations
        (ref ``one_two_matching.py:170``)."""
        from scipy.optimize import linear_sum_assignment

        cost = -np.asarray(self.logits)
        cost = np.concatenate([cost, cost], axis=-1)
        value = linear_sum_assignment(cost)[1]
        return jnp.asarray(value % self.logits.shape[1], dtype=jnp.int32)


def enumerate_one_two_matchings(num_destins):
    """All one-two matchings, recursively (ref ``one_two_matching.py:177``);
    host-side numpy."""
    if num_destins == 1:
        return np.array([[0, 0]], dtype=np.int64)

    num_sources = num_destins * 2
    subproblem = enumerate_one_two_matchings(num_destins - 1)
    subsize = subproblem.shape[0]
    result = np.empty(
        (subsize * num_sources * (num_sources - 1) // 2, num_sources),
        dtype=np.int64,
    )
    d = num_destins - 1
    pos = 0
    for s1 in range(num_sources):
        for s0 in range(s1):
            block = result[pos : pos + subsize]
            block[:, :s0] = subproblem[:, :s0]
            block[:, s0] = d
            block[:, s0 + 1 : s1] = subproblem[:, s0 : s1 - 1]
            block[:, s1] = d
            block[:, s1 + 1 :] = subproblem[:, s1 - 1 :]
            pos += subsize
    return result


def maximum_weight_matching(logits):
    """Hungarian-algorithm MAP matching (ref ``one_one_matching.py:169``)."""
    from scipy.optimize import linear_sum_assignment

    cost = -np.asarray(logits)
    value = linear_sum_assignment(cost)[1]
    return jnp.asarray(value, dtype=jnp.int32)
