"""Kingman coalescent distributions over phylogeny coalescence times.

Ref ``pyro/distributions/coalescent.py``: ``CoalescentTimes:35``,
``CoalescentTimesWithRate:102``, ``CoalescentRateLikelihood:213``,
``bio_phylo_to_times:326``, ``_make_phylogeny:450``.

TPU-first notes: the phylogeny summary is a single ``argsort`` over the
2N-1 merged events plus cumulative sums — all static shapes, jittable.
The reference's ``scatter_add_`` constructions in
``CoalescentRateLikelihood`` are re-expressed as one-hot einsum
contractions (events x duration), which is how scatters map onto the MXU.
"""

from __future__ import annotations

from collections import namedtuple

import jax
import jax.numpy as jnp
import numpy as np

from . import constraints
from .distribution import Distribution
from .util import broadcast_shape

_TINY = jnp.finfo(jnp.float32).tiny


class CoalescentTimesConstraint(constraints.Constraint):
    """Ref ``coalescent.py:17``."""

    event_dim = 1

    def __init__(self, leaf_times, *, ordered=True):
        self.leaf_times = leaf_times
        self.ordered = ordered

    def check(self, value):
        coal_times = value
        phylogeny = _make_phylogeny(self.leaf_times, coal_times)
        at_least_one_lineage = jnp.all(phylogeny.lineages > 0, axis=-1)
        if not self.ordered:
            return at_least_one_lineage
        ordered = jnp.all(value[..., :-1] <= value[..., 1:], axis=-1)
        return ordered & at_least_one_lineage


class CoalescentTimes(Distribution):
    """Distribution over sorted coalescent times of a complete binary
    phylogeny with irregularly sampled leaves and constant population size
    (Kingman 1982; ref ``coalescent.py:35``).

    ``event_shape = (num_leaves - 1,)``; samples are sorted ascending.
    """

    arg_constraints = {
        "leaf_times": constraints.real,
        "rate": constraints.positive,
    }

    def __init__(self, leaf_times, rate=1.0):
        leaf_times = jnp.asarray(leaf_times, jnp.result_type(float))
        rate = jnp.asarray(rate, leaf_times.dtype)
        batch_shape = broadcast_shape(
            jnp.shape(rate), leaf_times.shape[:-1]
        )
        event_shape = (leaf_times.shape[-1] - 1,)
        self.leaf_times = leaf_times
        self.rate = rate
        super().__init__(batch_shape, event_shape)

    @property
    def support(self):
        return CoalescentTimesConstraint(self.leaf_times)

    def log_prob(self, value):
        coal_times = value
        phylogeny = _make_phylogeny(self.leaf_times, coal_times)

        # the coalescent is a Poisson process whose rate is binomial in the
        # number of active lineages between events (ref :77-94)
        binomial = phylogeny.binomial[..., :-1]
        interval = phylogeny.times[..., :-1] - phylogeny.times[..., 1:]
        log_prob = jnp.log(self.rate) * coal_times.shape[-1] - self.rate * (
            jnp.sum(binomial * interval, -1)
        )
        log_abs_det_jacobian = -jnp.sum(
            jnp.log(phylogeny.coal_binomial), -1
        )
        return log_prob - log_abs_det_jacobian

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        leaf_times = jnp.broadcast_to(
            self.leaf_times, shape + self.leaf_times.shape[-1:]
        )
        return _sample_coalescent_times(key, leaf_times)


class CoalescentTimesWithRate(Distribution):
    """Coalescent times under a piecewise-constant rate grid
    (Popinga et al. 2014 eqs. 7-8; ref ``coalescent.py:102``).

    Rates live on unit intervals ``(-inf,1], [1,2], ..., [T-1,inf)``.
    Implements ``log_prob`` but not ``sample``.
    """

    arg_constraints = {
        "leaf_times": constraints.real,
        "rate_grid": constraints.positive,
    }

    def __init__(self, leaf_times, rate_grid):
        leaf_times = jnp.asarray(leaf_times, jnp.result_type(float))
        rate_grid = jnp.asarray(rate_grid, leaf_times.dtype)
        batch_shape = broadcast_shape(
            leaf_times.shape[:-1], rate_grid.shape[:-1]
        )
        event_shape = (leaf_times.shape[-1] - 1,)
        self.leaf_times = leaf_times
        self.rate_grid = rate_grid
        super().__init__(batch_shape, event_shape)

    @property
    def support(self):
        return CoalescentTimesConstraint(self.leaf_times)

    @property
    def duration(self):
        return self.rate_grid.shape[-1]

    def expand(self, batch_shape):
        new = object.__new__(CoalescentTimesWithRate)
        new.leaf_times = self.leaf_times
        new.rate_grid = self.rate_grid
        Distribution.__init__(new, tuple(batch_shape), self.event_shape)
        new._pyro_init_args = self._pyro_init_args
        return new

    def log_prob(self, value):
        """O(T + S N log N) likelihood (ref ``coalescent.py:174``)."""
        coal_times = value
        phylogeny = _make_phylogeny(self.leaf_times, coal_times)

        # survival factors over closed intervals via the rate integral
        cumsum = jnp.cumsum(self.rate_grid, -1)
        cumsum = jnp.pad(
            cumsum, [(0, 0)] * (cumsum.ndim - 1) + [(1, 0)]
        )
        integral = _interpolate_gather(cumsum, phylogeny.times[..., 1:])
        integral = integral[..., :-1] - integral[..., 1:]
        integral = jnp.clip(integral, _TINY)
        log_prob = -jnp.sum(phylogeny.binomial[..., 1:-1] * integral, -1)

        # density of the coalescent events themselves
        i = jnp.clip(
            jnp.floor(coal_times), 0, self.duration - 1
        ).astype(jnp.int32)
        rates = phylogeny.coal_binomial * _gather(self.rate_grid, i)
        log_prob = log_prob + jnp.sum(jnp.log(jnp.clip(rates, _TINY)), -1)

        batch_shape = broadcast_shape(self.batch_shape, value.shape[:-1])
        return jnp.broadcast_to(log_prob, batch_shape)


class CoalescentRateLikelihood:
    """Transposed version of :class:`CoalescentTimesWithRate` that makes
    the elements of ``rate_grid`` independent, for use under ``plate`` or
    ``markov`` (ref ``coalescent.py:213``)::

        likelihood = CoalescentRateLikelihood(leaf_times, coal_times, T)
        with pyro.plate("time", T):
            pyro.factor("coalescent", likelihood(rate_grid))

    The likelihood decomposes per time bin as
    ``const[t] + linear[t] * rate[t] + log[t] * log(rate[t])``; the three
    coefficient grids are precomputed here with one-hot einsum scatters.
    """

    def __init__(self, leaf_times, coal_times, duration, *, validate_args=None):
        leaf_times = jnp.asarray(leaf_times, jnp.result_type(float))
        coal_times = jnp.asarray(coal_times, leaf_times.dtype)
        assert leaf_times.shape[-1] == 1 + coal_times.shape[-1]
        assert isinstance(duration, int) and duration >= 2
        if validate_args:
            constraint = CoalescentTimesConstraint(leaf_times, ordered=False)
            if not bool(jnp.all(constraint.check(coal_times))):
                raise ValueError("Invalid (leaf_times, coal_times)")

        phylogeny = _make_phylogeny(leaf_times, coal_times)
        batch_shape = phylogeny.times.shape[:-1]

        # linear part from survival intervals outside [0, duration]
        times = jnp.clip(phylogeny.times, None, 0)
        intervals = times[..., 1:] - times[..., :-1]
        pre_linear = jnp.sum(
            phylogeny.binomial[..., :-1] * intervals, -1, keepdims=True
        )
        times = jnp.clip(phylogeny.times, duration)
        intervals = times[..., 1:] - times[..., :-1]
        post_linear = jnp.sum(
            phylogeny.binomial[..., :-1] * intervals, -1, keepdims=True
        )
        self._linear = jnp.concatenate(
            [
                pre_linear,
                jnp.zeros(pre_linear.shape[:-1] + (duration - 2,)),
                post_linear,
            ],
            axis=-1,
        )

        # linear part from survival within [0, duration]: interpolated
        # scatter-add of binomial decrements, then a reversed cumsum
        times = jnp.clip(phylogeny.times, 0, duration)
        sparse_diff = (
            phylogeny.binomial[..., :-1] - phylogeny.binomial[..., 1:]
        )
        dense_diff = _interpolate_scatter_add(
            jnp.zeros(batch_shape + (1 + duration,)),
            times[..., 1:],
            sparse_diff,
        )
        self._linear = self._linear + jnp.flip(
            jnp.cumsum(jnp.flip(dense_diff, -1), -1), -1
        )[..., 1:]

        # const and log parts from coalescent events (one-hot scatter)
        coal_index = jnp.clip(
            jnp.floor(coal_times), 0, duration - 1
        ).astype(jnp.int32)
        onehot = jax.nn.one_hot(coal_index, duration, dtype=leaf_times.dtype)
        self._const = jnp.einsum(
            "...n,...nt->...t", jnp.log(phylogeny.coal_binomial), onehot
        )
        self._log = jnp.sum(onehot, -2)

    def __call__(self, rate_grid, t=slice(None)):
        """Likelihood contribution of time bin(s) ``t`` (ref :292)."""
        const = self._const[..., t]
        linear = self._linear[..., t] * rate_grid
        log = self._log[..., t] * jnp.log(jnp.clip(rate_grid, _TINY))
        return const + linear + log


def bio_phylo_to_times(tree, *, get_time=None):
    """Extract ``(leaf_times, coal_times)`` from a Bio.Phylo tree
    (ref ``coalescent.py:326``; duck-typed, no Bio import needed)."""
    if get_time is None:

        def get_branch_length(clade):
            branch_length = clade.branch_length
            return 1.0 if branch_length is None else branch_length

        times = {tree.root: get_branch_length(tree.root)}

    leaf_times = []
    coal_times = []
    for clade in tree.find_clades():
        if get_time is None:
            time = times[clade]
            for child in clade:
                times[child] = time + get_branch_length(child)
        else:
            time = get_time(clade)

        num_children = len(clade)
        if num_children == 0:
            leaf_times.append(time)
        else:
            # split n-ary events into n-1 binary coalescences
            for _ in range(num_children - 1):
                coal_times.append(time)
    assert len(leaf_times) == 1 + len(coal_times)
    return jnp.asarray(leaf_times), jnp.asarray(coal_times)


def _gather(tensor, index):
    """Broadcasting gather along the last dim."""
    shape = broadcast_shape(tensor.shape[:-1], index.shape[:-1])
    tensor = jnp.broadcast_to(tensor, shape + tensor.shape[-1:])
    index = jnp.broadcast_to(index, shape + index.shape[-1:])
    return jnp.take_along_axis(tensor, index, axis=-1)


def _interpolate_gather(array, x):
    """Continuous indexing into the last dim with linear interpolation
    (ref ``coalescent.py:386``)."""
    x0 = jnp.clip(jnp.floor(x), 0, array.shape[-1] - 2)
    x1 = x0 + 1
    f0 = _gather(array, x0.astype(jnp.int32))
    f1 = _gather(array, x1.astype(jnp.int32))
    return f0 * (x1 - x) + f1 * (x - x0)


def _interpolate_scatter_add(dst, x, src):
    """Continuous scatter-add into the last dim with linear interpolation,
    expressed as a one-hot einsum (TPU-native replacement for the
    reference's in-place ``scatter_add_``, ref ``coalescent.py:399``)."""
    D = dst.shape[-1]
    x0 = jnp.clip(jnp.floor(x), 0, D - 2)
    x1 = x0 + 1
    oh0 = jax.nn.one_hot(x0.astype(jnp.int32), D, dtype=dst.dtype)
    oh1 = jax.nn.one_hot(x1.astype(jnp.int32), D, dtype=dst.dtype)
    add = jnp.einsum("...n,...nt->...t", src * (x1 - x), oh0)
    add = add + jnp.einsum("...n,...nt->...t", src * (x - x0), oh1)
    return dst + add


_Phylogeny = namedtuple(
    "_Phylogeny", ("times", "signs", "lineages", "binomial", "coal_binomial")
)


def _make_phylogeny(leaf_times, coal_times):
    """Merge leaf and coalescent events into reverse-time order and compute
    lineage counts (ref ``coalescent.py:450``).  One argsort over 2N-1
    events + cumsums; static shapes, jittable."""
    leaf_times = jnp.asarray(leaf_times, jnp.result_type(float))
    coal_times = jnp.asarray(coal_times, leaf_times.dtype)
    assert leaf_times.shape[-1] == 1 + coal_times.shape[-1]

    N = leaf_times.shape[-1]
    batch_shape = broadcast_shape(
        leaf_times.shape[:-1], coal_times.shape[:-1]
    )
    leaf_times = jnp.broadcast_to(leaf_times, batch_shape + (N,))
    coal_times = jnp.broadcast_to(coal_times, batch_shape + (N - 1,))

    # coalescent sign -1, leaf sign +1
    times = jnp.concatenate([coal_times, leaf_times], axis=-1)
    signs = jnp.sign(jnp.linspace(1.5 - N, N - 0.5, 2 * N - 1))

    # sort latest-to-earliest
    order = jnp.argsort(-times, axis=-1)
    times = jnp.take_along_axis(times, order, axis=-1)
    signs = jnp.broadcast_to(signs, order.shape)
    signs = jnp.take_along_axis(signs, order, axis=-1)
    inv_order = jnp.argsort(order, axis=-1)

    lineages = jnp.cumsum(signs, -1)
    binomial = lineages * (lineages - 1) / 2

    # binomial coefficient immediately preceding each coalescent event
    coal_index = inv_order[..., : N - 1]
    coal_binomial = jnp.take_along_axis(binomial, coal_index - 1, axis=-1)

    return _Phylogeny(times, signs, lineages, binomial, coal_binomial)


def _sample_coalescent_times(key, leaf_times):
    """Sequential prior sampler (host-side numpy; ref ``coalescent.py:487``).
    Sampling a phylogeny is inherently sequential in the number of leaves;
    this is data generation, not a jit hot path."""
    leaf_times = np.asarray(leaf_times)
    N = leaf_times.shape[-1]
    batch_shape = leaf_times.shape[:-1]
    flat = leaf_times.reshape(-1, N)
    rng = np.random.default_rng(
        np.asarray(jax.random.key_data(key)).sum() % (2**32)
    )
    out = []
    for row in flat:
        srt = np.sort(row)[::-1]
        coal_times = []
        leaf = 1
        t = srt[leaf]
        active = 2
        binomial = active * (active - 1) / 2
        for u in rng.exponential(size=N - 1):
            while leaf + 1 < N and u > (t - srt[leaf + 1]) * binomial:
                leaf += 1
                u -= (t - srt[leaf]) * binomial
                t = srt[leaf]
                active += 1
                binomial = active * (active - 1) / 2
            t -= u / binomial
            active -= 1
            binomial = active * (active - 1) / 2
            coal_times.append(t)
        coal_times.reverse()
        out.append(coal_times)
    result = np.asarray(out, dtype=leaf_times.dtype).reshape(
        batch_shape + (N - 1,)
    )
    return jnp.asarray(result)
