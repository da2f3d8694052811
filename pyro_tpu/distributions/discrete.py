"""Discrete distributions.

Ref ``pyro/distributions/torch.py`` wrappers + ``zero_inflated.py``,
``conjugate.py``.  All support explicit-key sampling; Bernoulli/Categorical/
OneHotCategorical implement ``enumerate_support`` for the enumeration engine.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from . import constraints
from .distribution import Distribution
from .util import (
    broadcast_shape,
    clamp_probs,
    lazy_property,
    logits_to_probs,
    probs_to_logits,
    promote_shapes,
)


def _entmax_arg(probs=None, logits=None):
    if (probs is None) == (logits is None):
        raise ValueError("pass exactly one of probs or logits")


class Bernoulli(Distribution):
    arg_constraints = {
        "probs": constraints.unit_interval,
        "logits": constraints.real,
    }
    support = constraints.boolean
    has_enumerate_support = True
    is_discrete = True

    def __init__(self, probs=None, logits=None):
        _entmax_arg(probs, logits)
        if probs is not None:
            self._probs = jnp.asarray(probs, jnp.result_type(probs, jnp.float32))
            self._logits = None
            batch_shape = jnp.shape(self._probs)
        else:
            self._logits = jnp.asarray(logits, jnp.result_type(logits, jnp.float32))
            self._probs = None
            batch_shape = jnp.shape(self._logits)
        super().__init__(batch_shape)

    @lazy_property
    def probs(self):
        return (
            self._probs
            if self._probs is not None
            else logits_to_probs(self._logits, is_binary=True)
        )

    @lazy_property
    def logits(self):
        return (
            self._logits
            if self._logits is not None
            else probs_to_logits(self._probs, is_binary=True)
        )

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = jax.random.uniform(key, shape)
        return (u < self.probs).astype(jnp.result_type(float))

    def log_prob(self, value):
        logits = self.logits
        # -softplus(-logits) = log p ; -softplus(logits) = log(1-p)
        return value * logits - jax.nn.softplus(logits)

    @property
    def mean(self):
        return self.probs

    @property
    def variance(self):
        return self.probs * (1 - self.probs)

    def entropy(self):
        p = clamp_probs(self.probs)
        return -(p * jnp.log(p) + (1 - p) * jnp.log1p(-p))

    def enumerate_support(self, expand=True):
        values = jnp.reshape(
            jnp.arange(2.0), (2,) + (1,) * len(self.batch_shape)
        )
        if expand:
            values = jnp.broadcast_to(values, (2,) + self.batch_shape)
        return values

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        if self._probs is not None:
            return Bernoulli(probs=jnp.broadcast_to(self._probs, batch_shape))
        return Bernoulli(logits=jnp.broadcast_to(self._logits, batch_shape))

    @property
    def mode(self):
        """Mode (torch parity)."""
        return (self.probs > 0.5).astype(self.probs.dtype)


class Categorical(Distribution):
    arg_constraints = {
        "probs": constraints.simplex,
        "logits": constraints.real_vector,
    }
    has_enumerate_support = True
    is_discrete = True

    def __init__(self, probs=None, logits=None):
        _entmax_arg(probs, logits)
        if probs is not None:
            probs = jnp.asarray(probs, jnp.result_type(probs, jnp.float32))
            # torch semantics: probs need not be normalized — normalize
            # along the event dim (torch Categorical.__init__)
            self._probs = probs / jnp.sum(probs, axis=-1, keepdims=True)
            self._logits = None
            batch_shape = jnp.shape(self._probs)[:-1]
            self._num_events = jnp.shape(self._probs)[-1]
        else:
            self._logits = jnp.asarray(logits, jnp.result_type(logits, jnp.float32))
            self._probs = None
            batch_shape = jnp.shape(self._logits)[:-1]
            self._num_events = jnp.shape(self._logits)[-1]
        super().__init__(batch_shape)

    @property
    def support(self):  # type: ignore[override]
        return constraints.integer_interval(0, self._num_events - 1)

    @lazy_property
    def probs(self):
        return (
            self._probs
            if self._probs is not None
            else logits_to_probs(self._logits)
        )

    @lazy_property
    def logits(self):
        if self._logits is not None:
            return self._logits - jsp.logsumexp(
                self._logits, axis=-1, keepdims=True
            )
        return probs_to_logits(self._probs)

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        logits = jnp.broadcast_to(self.logits, shape + (self._num_events,))
        return jax.random.categorical(key, logits, axis=-1)

    def log_prob(self, value):
        value = jnp.asarray(value)
        logits = self.logits
        # When value's and logits' nontrivial batch axes are DISJOINT
        # (enumerated value against enumerated parameters - the hot path
        # of TraceEnum_ELBO at scale), a broadcast-join take_along_axis
        # forces its VJP to scatter into a value_batch x logits_batch x K
        # tensor (K^3-class memory).  Gather on the flat axes instead and
        # transpose into broadcast order: the VJP is a scatter into
        # logits' own shape.
        l_batch = jnp.shape(logits)[:-1]
        v_shape = jnp.shape(value)
        r = max(len(v_shape), len(l_batch))
        vs = (1,) * (r - len(v_shape)) + tuple(v_shape)
        ls = (1,) * (r - len(l_batch)) + tuple(l_batch)
        disjoint = all(v == 1 or l == 1 for v, l in zip(vs, ls))
        if disjoint and r > 0:
            K = self._num_events
            v_axes = [i for i in range(r) if vs[i] > 1]
            lp = jnp.take(
                logits.reshape(ls + (K,)),
                value.reshape(-1).astype(jnp.int32),
                axis=-1,
            )  # ls + (n_value_elems,)
            lp = lp.reshape(ls + tuple(vs[i] for i in v_axes))
            # transpose the trailing value axes into their broadcast
            # positions; the displaced size-1 axes go to the end and are
            # reshaped away
            order = [
                r + v_axes.index(i) if i in v_axes else i
                for i in range(r)
            ] + v_axes
            lp = jnp.transpose(lp, order)
            return lp.reshape(
                tuple(max(v, l) for v, l in zip(vs, ls))
            )
        value_b, logits_b = _broadcast_cat(value, logits)
        return jnp.take_along_axis(
            logits_b, value_b[..., None].astype(jnp.int32), axis=-1
        )[..., 0]

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.nan)

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.nan)

    def entropy(self):
        p = clamp_probs(self.probs)
        return -jnp.sum(p * jnp.log(p), axis=-1)

    def enumerate_support(self, expand=True):
        values = jnp.reshape(
            jnp.arange(self._num_events),
            (self._num_events,) + (1,) * len(self.batch_shape),
        )
        if expand:
            values = jnp.broadcast_to(
                values, (self._num_events,) + self.batch_shape
            )
        return values

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        if self._probs is not None:
            return Categorical(
                probs=jnp.broadcast_to(
                    self._probs, batch_shape + (self._num_events,)
                )
            )
        return Categorical(
            logits=jnp.broadcast_to(
                self._logits, batch_shape + (self._num_events,)
            )
        )

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.argmax(self.probs, axis=-1)


def _broadcast_cat(value, logits):
    shape = broadcast_shape(jnp.shape(value), jnp.shape(logits)[:-1])
    return (
        jnp.broadcast_to(value, shape),
        jnp.broadcast_to(logits, shape + jnp.shape(logits)[-1:]),
    )


class OneHotCategorical(Distribution):
    arg_constraints = {
        "probs": constraints.simplex,
        "logits": constraints.real_vector,
    }
    support = constraints.simplex  # one-hot vectors live on the simplex
    has_enumerate_support = True
    is_discrete = True

    def __init__(self, probs=None, logits=None):
        self._categorical = Categorical(probs=probs, logits=logits)
        super().__init__(
            self._categorical.batch_shape, (self._categorical._num_events,)
        )

    @property
    def probs(self):
        return self._categorical.probs

    @property
    def logits(self):
        return self._categorical.logits

    def sample(self, key, sample_shape=()):
        idx = self._categorical.sample(key, sample_shape)
        return jax.nn.one_hot(
            idx, self._categorical._num_events, dtype=self.probs.dtype
        )

    def log_prob(self, value):
        return jnp.sum(self.logits * value, axis=-1)

    @property
    def mean(self):
        return self.probs

    @property
    def variance(self):
        return self.probs * (1 - self.probs)

    def enumerate_support(self, expand=True):
        n = self._categorical._num_events
        values = jnp.eye(n)
        values = jnp.reshape(
            values, (n,) + (1,) * len(self.batch_shape) + (n,)
        )
        if expand:
            values = jnp.broadcast_to(values, (n,) + self.batch_shape + (n,))
        return values

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        n = self._categorical._num_events
        if self._categorical._probs is not None:
            return type(self)(
                probs=jnp.broadcast_to(
                    self._categorical._probs, batch_shape + (n,)
                )
            )
        return type(self)(
            logits=jnp.broadcast_to(
                self._categorical._logits, batch_shape + (n,)
            )
        )

    @property
    def mode(self):
        """Mode (torch parity): one-hot at the most probable category."""
        idx = jnp.argmax(self.probs, axis=-1)
        return jax.nn.one_hot(idx, self.probs.shape[-1], dtype=self.probs.dtype)


class Binomial(Distribution):
    """Binomial with optional Normal approximation for huge counts.

    Ref ``pyro/distributions/torch.py:44-90``: Pyro patches torch's Binomial
    with ``approx_sample_thresh`` to Poisson/Normal-approximate sampling for
    large ``total_count``; here exact sampling uses a fori_loop-free
    inverse-CDF-in-batches scheme only for small counts and a Normal
    approximation above the threshold.
    """

    arg_constraints = {
        "total_count": constraints.nonnegative_integer,
        "probs": constraints.unit_interval,
        "logits": constraints.real,
    }
    is_discrete = True
    has_enumerate_support = True
    approx_sample_thresh = 10000

    def __init__(self, total_count=1, probs=None, logits=None):
        _entmax_arg(probs, logits)
        if probs is not None:
            self._probs = jnp.asarray(probs, jnp.result_type(probs, jnp.float32))
            self._logits = None
            param_shape = jnp.shape(self._probs)
        else:
            self._logits = jnp.asarray(logits, jnp.result_type(logits, jnp.float32))
            self._probs = None
            param_shape = jnp.shape(self._logits)
        self.total_count = jnp.asarray(total_count)
        batch_shape = broadcast_shape(jnp.shape(total_count), param_shape)
        super().__init__(batch_shape)

    @property
    def support(self):  # type: ignore[override]
        return constraints.integer_interval(0, self.total_count)

    @lazy_property
    def probs(self):
        return (
            self._probs
            if self._probs is not None
            else logits_to_probs(self._logits, is_binary=True)
        )

    @lazy_property
    def logits(self):
        return (
            self._logits
            if self._logits is not None
            else probs_to_logits(self._probs, is_binary=True)
        )

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        n = jnp.broadcast_to(self.total_count, shape)
        p = jnp.broadcast_to(self.probs, shape)
        return jax.random.binomial(key, n, p, shape=shape)

    def log_prob(self, value):
        from ..ops.special import log_binomial

        n = self.total_count
        lp = jnp.log(clamp_probs(self.probs))
        l1mp = jnp.log1p(-clamp_probs(self.probs))
        return log_binomial(n, value) + value * lp + (n - value) * l1mp

    @property
    def mean(self):
        return self.total_count * self.probs

    @property
    def variance(self):
        return self.total_count * self.probs * (1 - self.probs)

    def enumerate_support(self, expand=True):
        total_count = int(self.total_count.max())
        values = jnp.reshape(
            jnp.arange(1 + total_count, dtype=jnp.result_type(float)),
            (-1,) + (1,) * len(self.batch_shape),
        )
        if expand:
            values = jnp.broadcast_to(
                values, values.shape[:1] + self.batch_shape
            )
        return values

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        n = jnp.broadcast_to(self.total_count, batch_shape)
        if self._probs is not None:
            return Binomial(n, probs=jnp.broadcast_to(self._probs, batch_shape))
        return Binomial(n, logits=jnp.broadcast_to(self._logits, batch_shape))

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.clip(jnp.floor((self.total_count + 1) * self.probs), None, self.total_count)


class Multinomial(Distribution):
    arg_constraints = {
        "probs": constraints.simplex,
        "logits": constraints.real_vector,
    }
    is_discrete = True

    def __init__(self, total_count=1, probs=None, logits=None):
        self._categorical = Categorical(probs=probs, logits=logits)
        self.total_count = total_count
        super().__init__(
            self._categorical.batch_shape, (self._categorical._num_events,)
        )

    @property
    def support(self):  # type: ignore[override]
        return constraints.multinomial(self.total_count)

    @property
    def probs(self):
        return self._categorical.probs

    @property
    def logits(self):
        return self._categorical.logits

    def sample(self, key, sample_shape=()):
        assert isinstance(
            self.total_count, int
        ), "Multinomial.sample requires static integer total_count"
        n = self._categorical._num_events
        shape = tuple(sample_shape) + self.batch_shape
        idx = self._categorical.sample(key, (self.total_count,) + tuple(sample_shape))
        onehot = jax.nn.one_hot(idx, n, dtype=self.probs.dtype)
        return jnp.sum(onehot, axis=0)

    def log_prob(self, value):
        logits = self._categorical.logits
        log_factorial_n = jsp.gammaln(jnp.sum(value, axis=-1) + 1)
        log_factorial_xs = jnp.sum(jsp.gammaln(value + 1), axis=-1)
        return (
            log_factorial_n
            - log_factorial_xs
            + jnp.sum(value * logits, axis=-1)
        )

    @property
    def mean(self):
        return self.total_count * self.probs

    @property
    def variance(self):
        return self.total_count * self.probs * (1 - self.probs)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        n = self._categorical._num_events
        if self._categorical._probs is not None:
            return Multinomial(
                self.total_count,
                probs=jnp.broadcast_to(
                    self._categorical._probs, batch_shape + (n,)
                ),
            )
        return Multinomial(
            self.total_count,
            logits=jnp.broadcast_to(
                self._categorical._logits, batch_shape + (n,)
            ),
        )


class Poisson(Distribution):
    arg_constraints = {"rate": constraints.positive}
    support = constraints.nonnegative_integer
    is_discrete = True

    def __init__(self, rate, *, is_sparse=False):
        self.rate = jnp.asarray(rate, jnp.result_type(rate, jnp.float32))
        self.is_sparse = is_sparse
        super().__init__(jnp.shape(rate))

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        return jax.random.poisson(key, self.rate, shape).astype(
            jnp.result_type(float)
        )

    def log_prob(self, value):
        return (
            value * jnp.log(self.rate)
            - self.rate
            - jsp.gammaln(value + 1)
        )

    @property
    def mean(self):
        return self.rate

    @property
    def variance(self):
        return self.rate

    def expand(self, batch_shape, _instance=None):
        return Poisson(jnp.broadcast_to(self.rate, tuple(batch_shape)))

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.floor(self.rate)


class Geometric(Distribution):
    """Number of failures before first success."""

    arg_constraints = {
        "probs": constraints.unit_interval,
        "logits": constraints.real,
    }
    support = constraints.nonnegative_integer
    is_discrete = True

    def __init__(self, probs=None, logits=None):
        _entmax_arg(probs, logits)
        if probs is not None:
            self._probs = jnp.asarray(probs, jnp.result_type(probs, jnp.float32))
            self._logits = None
            batch_shape = jnp.shape(self._probs)
        else:
            self._logits = jnp.asarray(logits, jnp.result_type(logits, jnp.float32))
            self._probs = None
            batch_shape = jnp.shape(self._logits)
        super().__init__(batch_shape)

    @lazy_property
    def probs(self):
        return (
            self._probs
            if self._probs is not None
            else logits_to_probs(self._logits, is_binary=True)
        )

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = jax.random.uniform(key, shape, minval=jnp.finfo(jnp.float32).tiny)
        return jnp.floor(jnp.log(u) / jnp.log1p(-clamp_probs(self.probs)))

    def log_prob(self, value):
        p = clamp_probs(self.probs)
        return value * jnp.log1p(-p) + jnp.log(p)

    @property
    def mean(self):
        return (1 - self.probs) / self.probs

    @property
    def variance(self):
        return (1 - self.probs) / self.probs**2

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        if self._probs is not None:
            return Geometric(probs=jnp.broadcast_to(self._probs, batch_shape))
        return Geometric(logits=jnp.broadcast_to(self._logits, batch_shape))

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.zeros(self.batch_shape)

    @property
    def logits(self):
        """Log-odds of success (torch parity)."""
        return probs_to_logits(self.probs, is_binary=True)


class NegativeBinomial(Distribution):
    """Number of failures before total_count successes (torch param)."""

    arg_constraints = {
        "total_count": constraints.positive,
        "probs": constraints.unit_interval,
        "logits": constraints.real,
    }
    support = constraints.nonnegative_integer
    is_discrete = True

    def __init__(self, total_count, probs=None, logits=None):
        _entmax_arg(probs, logits)
        self.total_count = jnp.asarray(
            total_count, jnp.result_type(total_count, jnp.float32)
        )
        if probs is not None:
            self._probs = jnp.asarray(probs, jnp.result_type(probs, jnp.float32))
            self._logits = None
            pshape = jnp.shape(self._probs)
        else:
            self._logits = jnp.asarray(logits, jnp.result_type(logits, jnp.float32))
            self._probs = None
            pshape = jnp.shape(self._logits)
        super().__init__(broadcast_shape(jnp.shape(total_count), pshape))

    @lazy_property
    def probs(self):
        return (
            self._probs
            if self._probs is not None
            else logits_to_probs(self._logits, is_binary=True)
        )

    def sample(self, key, sample_shape=()):
        # Gamma-Poisson mixture
        shape = self.shape(sample_shape)
        kg, kp = jax.random.split(key)
        p = clamp_probs(jnp.broadcast_to(self.probs, shape))
        rate = jax.random.gamma(
            kg, jnp.broadcast_to(self.total_count, shape), shape
        ) * (p / (1 - p))
        return jax.random.poisson(kp, rate, shape).astype(
            jnp.result_type(float)
        )

    def log_prob(self, value):
        from ..ops.special import log_beta

        n, p = self.total_count, clamp_probs(self.probs)
        return (
            -log_beta(n, value + 1.0)
            - jnp.log(n + value)
            + n * jnp.log1p(-p)
            + value * jnp.log(p)
        )

    @property
    def mean(self):
        p = self.probs
        return self.total_count * p / (1 - p)

    @property
    def variance(self):
        p = self.probs
        return self.total_count * p / (1 - p) ** 2

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        n = jnp.broadcast_to(self.total_count, batch_shape)
        if self._probs is not None:
            return NegativeBinomial(
                n, probs=jnp.broadcast_to(self._probs, batch_shape)
            )
        return NegativeBinomial(
            n, logits=jnp.broadcast_to(self._logits, batch_shape)
        )

    @property
    def logits(self):
        """Log-odds of success (torch parity)."""
        return probs_to_logits(self.probs, is_binary=True)

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.clip(
            jnp.floor((self.total_count - 1) * jnp.exp(self.logits)), 0, None
        )
