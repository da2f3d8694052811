"""Compound (conjugate-pair) distributions.

Ref ``pyro/distributions/conjugate.py``: BetaBinomial, DirichletMultinomial,
GammaPoisson.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from . import constraints
from .continuous import Beta, Gamma
from .discrete import Poisson
from .distribution import Distribution
from .multivariate import Dirichlet
from .util import broadcast_shape, promote_shapes
from ..ops.special import log_beta, log_binomial


class BetaBinomial(Distribution):
    """Binomial with Beta-distributed success probability.

    Ref ``conjugate.py:BetaBinomial``.
    """

    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
        "total_count": constraints.nonnegative_integer,
    }
    is_discrete = True
    has_enumerate_support = True
    approx_log_prob_tol = 0.0

    def __init__(self, concentration1, concentration0, total_count=1):
        self.concentration1, self.concentration0, self.total_count = (
            promote_shapes(
                jnp.asarray(concentration1, jnp.result_type(concentration1, jnp.float32)),
                jnp.asarray(concentration0, jnp.result_type(concentration0, jnp.float32)),
                jnp.asarray(total_count),
            )
        )
        batch_shape = broadcast_shape(
            jnp.shape(concentration1),
            jnp.shape(concentration0),
            jnp.shape(total_count),
        )
        super().__init__(batch_shape)

    @property
    def support(self):  # type: ignore[override]
        return constraints.integer_interval(0, self.total_count)

    def sample(self, key, sample_shape=()):
        kb, kn = jax.random.split(key)
        probs = Beta(self.concentration1, self.concentration0).sample(
            kb, sample_shape
        )
        shape = self.shape(sample_shape)
        n = jnp.broadcast_to(self.total_count, shape)
        return jax.random.binomial(kn, n, probs, shape=shape)

    def log_prob(self, value):
        a, b, n = self.concentration1, self.concentration0, self.total_count
        tol = self.approx_log_prob_tol
        return (
            log_binomial(n, value, tol)
            + log_beta(value + a, n - value + b, tol)
            - log_beta(a, b, tol)
        )

    @property
    def mean(self):
        return (
            self.total_count
            * self.concentration1
            / (self.concentration1 + self.concentration0)
        )

    @property
    def variance(self):
        a, b, n = self.concentration1, self.concentration0, self.total_count
        total = a + b
        return n * a * b * (total + n) / (total**2 * (total + 1))

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
        return BetaBinomial(
            jnp.broadcast_to(self.concentration1, batch_shape),
            jnp.broadcast_to(self.concentration0, batch_shape),
            jnp.broadcast_to(self.total_count, batch_shape),
        )


class DirichletMultinomial(Distribution):
    """Ref ``conjugate.py:DirichletMultinomial``."""

    arg_constraints = {
        "concentration": constraints.independent(constraints.positive, 1),
        "total_count": constraints.nonnegative_integer,
    }
    is_discrete = True

    def __init__(self, concentration, total_count=1, is_sparse=False):
        self.concentration = jnp.asarray(
            concentration, jnp.result_type(concentration, jnp.float32)
        )
        self.total_count = total_count
        self.is_sparse = is_sparse
        batch_shape = broadcast_shape(
            self.concentration.shape[:-1], jnp.shape(total_count)
        )
        super().__init__(batch_shape, self.concentration.shape[-1:])

    @property
    def support(self):  # type: ignore[override]
        return constraints.multinomial(self.total_count)

    def sample(self, key, sample_shape=()):
        from .discrete import Multinomial

        kd, km = jax.random.split(key)
        probs = Dirichlet(self.concentration).sample(kd, sample_shape)
        return Multinomial(
            int(self.total_count)
            if not isinstance(self.total_count, int)
            else self.total_count,
            probs=probs,
        ).sample(km)

    def log_prob(self, value):
        a = self.concentration
        n = jnp.sum(value, axis=-1)
        a0 = jnp.sum(a, axis=-1)
        return (
            jsp.gammaln(a0)
            + jsp.gammaln(n + 1)
            - jsp.gammaln(n + a0)
            + jnp.sum(
                jsp.gammaln(value + a)
                - jsp.gammaln(a)
                - jsp.gammaln(value + 1),
                axis=-1,
            )
        )

    @property
    def mean(self):
        a = self.concentration
        return (
            jnp.asarray(self.total_count)[..., None]
            * a
            / jnp.sum(a, axis=-1, keepdims=True)
        )

    @property
    def variance(self):
        a = self.concentration
        a0 = jnp.sum(a, axis=-1, keepdims=True)
        n = jnp.asarray(self.total_count)[..., None]
        p = a / a0
        return n * p * (1 - p) * (n + a0) / (1 + a0)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return DirichletMultinomial(
            jnp.broadcast_to(
                self.concentration, batch_shape + self.event_shape
            ),
            self.total_count,
            self.is_sparse,
        )


class GammaPoisson(Distribution):
    """Poisson with Gamma-distributed rate == NegativeBinomial reparam.

    Ref ``conjugate.py:GammaPoisson``.
    """

    arg_constraints = {
        "concentration": constraints.positive,
        "rate": constraints.positive,
    }
    support = constraints.nonnegative_integer
    is_discrete = True

    def __init__(self, concentration, rate):
        self.concentration, self.rate = promote_shapes(
            jnp.asarray(concentration, jnp.result_type(concentration, jnp.float32)),
            jnp.asarray(rate, jnp.result_type(rate, jnp.float32)),
        )
        super().__init__(
            broadcast_shape(jnp.shape(concentration), jnp.shape(rate))
        )

    def sample(self, key, sample_shape=()):
        kg, kp = jax.random.split(key)
        rate = Gamma(self.concentration, self.rate).sample(kg, sample_shape)
        return Poisson(rate).sample(kp)

    def log_prob(self, value):
        a, b = self.concentration, self.rate
        post_value = a + value
        return (
            -log_beta(a, value + 1)
            - jnp.log(post_value)
            + a * jnp.log(b)
            - post_value * jnp.log1p(b)
        )

    @property
    def mean(self):
        return self.concentration / self.rate

    @property
    def variance(self):
        return self.concentration / self.rate**2 * (1 + self.rate)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return GammaPoisson(
            jnp.broadcast_to(self.concentration, batch_shape),
            jnp.broadcast_to(self.rate, batch_shape),
        )
