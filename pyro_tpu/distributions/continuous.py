"""Univariate continuous distributions.

Ref ``pyro/distributions/torch.py`` (mixin re-exports of ~45 torch
distributions) — here implemented natively on ``jax.random`` samplers and
``jax.scipy`` densities.  All are reparameterized where torch's are.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from . import constraints
from .distribution import Distribution, TransformedDistribution
from .transforms import AffineTransform, ExpTransform, PowerTransform
from .util import (
    broadcast_shape,
    clamp_probs,
    lazy_property,
    promote_shapes,
    von_mises_centered,
)


class UnivariateMixin:
    """Generic ``expand`` by broadcasting declared params."""

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        if batch_shape == self.batch_shape:
            return self
        new_params = {
            name: jnp.broadcast_to(
                getattr(self, name),
                batch_shape + self.event_shape[: _param_event_dim(self, name)],
            )
            for name in self.arg_constraints
        }
        return type(self)(**new_params)


def _param_event_dim(dist, name) -> int:
    c = dist.arg_constraints[name]
    return c.event_dim


class Normal(UnivariateMixin, Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    has_rsample = True
    reparametrized_params = ("loc", "scale")

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(broadcast_shape(jnp.shape(loc), jnp.shape(scale)))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + self.scale * eps

    def log_prob(self, value):
        var = self.scale**2
        log_scale = jnp.log(self.scale)
        return (
            -((value - self.loc) ** 2) / (2 * var)
            - log_scale
            - 0.5 * math.log(2 * math.pi)
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale**2, self.batch_shape)

    def entropy(self):
        return jnp.broadcast_to(
            0.5 + 0.5 * math.log(2 * math.pi) + jnp.log(self.scale),
            self.batch_shape,
        )

    def cdf(self, value):
        return jsp.ndtr((value - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * jsp.ndtri(q)

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape)


class Uniform(UnivariateMixin, Distribution):
    arg_constraints = {
        "low": constraints.dependent,
        "high": constraints.dependent,
    }
    has_rsample = True
    reparametrized_params = ("low", "high")

    def __init__(self, low=0.0, high=1.0):
        self.low, self.high = promote_shapes(
            jnp.asarray(low, jnp.result_type(low, jnp.float32)),
            jnp.asarray(high, jnp.result_type(high, jnp.float32)),
        )
        super().__init__(broadcast_shape(jnp.shape(low), jnp.shape(high)))

    @property
    def support(self):  # type: ignore[override]
        return constraints.interval(self.low, self.high)

    # expand must preserve dependent-constraint params
    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return Uniform(
            jnp.broadcast_to(self.low, batch_shape),
            jnp.broadcast_to(self.high, batch_shape),
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = jax.random.uniform(key, shape, self.low.dtype)
        return self.low + (self.high - self.low) * u

    def log_prob(self, value):
        inside = (value >= self.low) & (value <= self.high)
        lp = -jnp.log(self.high - self.low)
        return jnp.where(inside, lp, -jnp.inf)

    @property
    def mean(self):
        return jnp.broadcast_to((self.low + self.high) / 2, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            (self.high - self.low) ** 2 / 12, self.batch_shape
        )

    def entropy(self):
        return jnp.broadcast_to(jnp.log(self.high - self.low), self.batch_shape)

    def cdf(self, value):
        return jnp.clip((value - self.low) / (self.high - self.low), 0.0, 1.0)

    def icdf(self, q):
        return self.low + (self.high - self.low) * q


class Exponential(UnivariateMixin, Distribution):
    arg_constraints = {"rate": constraints.positive}
    support = constraints.positive
    has_rsample = True
    reparametrized_params = ("rate",)

    def __init__(self, rate=1.0):
        self.rate = jnp.asarray(rate, jnp.result_type(rate, jnp.float32))
        super().__init__(jnp.shape(rate))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        return jax.random.exponential(key, shape, self.rate.dtype) / self.rate

    def log_prob(self, value):
        return jnp.log(self.rate) - self.rate * value

    @property
    def mean(self):
        return 1.0 / self.rate

    @property
    def variance(self):
        return 1.0 / self.rate**2

    def entropy(self):
        return jnp.broadcast_to(1.0 - jnp.log(self.rate), self.batch_shape)

    def cdf(self, value):
        return -jnp.expm1(-self.rate * value)

    def icdf(self, q):
        return -jnp.log1p(-q) / self.rate

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.zeros(self.batch_shape)


class Gamma(UnivariateMixin, Distribution):
    arg_constraints = {
        "concentration": constraints.positive,
        "rate": constraints.positive,
    }
    support = constraints.positive
    has_rsample = True
    reparametrized_params = ("concentration", "rate")

    def __init__(self, concentration, rate=1.0):
        self.concentration, self.rate = promote_shapes(
            jnp.asarray(concentration, jnp.result_type(concentration, jnp.float32)),
            jnp.asarray(rate, jnp.result_type(rate, jnp.float32)),
        )
        super().__init__(
            broadcast_shape(jnp.shape(concentration), jnp.shape(rate))
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        # jax.random.gamma is implicitly reparameterized (implicit-grad rule)
        g = jax.random.gamma(key, self.concentration, shape, self.concentration.dtype)
        return g / self.rate

    def log_prob(self, value):
        return (
            self.concentration * jnp.log(self.rate)
            + (self.concentration - 1) * jnp.log(value)
            - self.rate * value
            - jsp.gammaln(self.concentration)
        )

    @property
    def mean(self):
        return self.concentration / self.rate

    @property
    def variance(self):
        return self.concentration / self.rate**2

    def entropy(self):
        a = self.concentration
        return jnp.broadcast_to(
            a - jnp.log(self.rate) + jsp.gammaln(a) + (1 - a) * jsp.digamma(a),
            self.batch_shape,
        )

    def cdf(self, value):
        return jsp.gammainc(self.concentration, self.rate * value)

    def conjugate_update(self, other):
        """Fuse two Gamma densities: p(z) q(z) = updated(z) exp(log_norm)
        (ref ``torch.py:178``)."""
        assert isinstance(other, Gamma)
        concentration = self.concentration + other.concentration - 1
        rate = self.rate + other.rate
        updated = Gamma(concentration, rate)

        def _log_normalizer(d):
            c = d.concentration
            return jnp.log(d.rate) * c - jax.lax.lgamma(c)

        log_normalizer = (
            _log_normalizer(self)
            + _log_normalizer(other)
            - _log_normalizer(updated)
        )
        return updated, log_normalizer

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.clip((self.concentration - 1) / self.rate, 0, None)


class Chi2(Gamma):
    arg_constraints = {"df": constraints.positive}

    def __init__(self, df):
        df = jnp.asarray(df, jnp.result_type(df, jnp.float32))
        self.df = df
        super().__init__(0.5 * df, 0.5)
        self._pyro_init_args = ((df,), ())

    def expand(self, batch_shape, _instance=None):
        return Chi2(jnp.broadcast_to(self.df, tuple(batch_shape)))


class InverseGamma(TransformedDistribution):
    """Ref ``pyro/distributions/inverse_gamma.py``."""

    arg_constraints = {
        "concentration": constraints.positive,
        "rate": constraints.positive,
    }
    support = constraints.positive
    has_rsample = True

    def __init__(self, concentration, rate=1.0):
        base = Gamma(concentration, rate)
        self.concentration = base.concentration
        self.rate = base.rate
        super().__init__(base, PowerTransform(-1.0))
        self._pyro_init_args = ((concentration, rate), ())

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return InverseGamma(
            jnp.broadcast_to(self.concentration, batch_shape),
            jnp.broadcast_to(self.rate, batch_shape),
        )

    @property
    def mean(self):
        a = self.concentration
        return jnp.where(a > 1, self.rate / (a - 1), jnp.inf)

    @property
    def variance(self):
        a = self.concentration
        return jnp.where(
            a > 2, self.rate**2 / ((a - 1) ** 2 * (a - 2)), jnp.inf
        )


class Beta(UnivariateMixin, Distribution):
    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
    }
    support = constraints.unit_interval
    has_rsample = True
    reparametrized_params = ("concentration1", "concentration0")

    def conjugate_update(self, other):
        """Fuse two Beta densities (ref ``torch.py:24``)."""
        assert isinstance(other, Beta)
        concentration1 = self.concentration1 + other.concentration1 - 1
        concentration0 = self.concentration0 + other.concentration0 - 1
        updated = Beta(concentration1, concentration0)

        def _log_normalizer(d):
            x, y = d.concentration1, d.concentration0
            return (
                jax.lax.lgamma(x + y)
                - jax.lax.lgamma(x)
                - jax.lax.lgamma(y)
            )

        log_normalizer = (
            _log_normalizer(self)
            + _log_normalizer(other)
            - _log_normalizer(updated)
        )
        return updated, log_normalizer

    def __init__(self, concentration1, concentration0):
        self.concentration1, self.concentration0 = promote_shapes(
            jnp.asarray(concentration1, jnp.result_type(concentration1, jnp.float32)),
            jnp.asarray(concentration0, jnp.result_type(concentration0, jnp.float32)),
        )
        super().__init__(
            broadcast_shape(
                jnp.shape(concentration1), jnp.shape(concentration0)
            )
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        k1, k2 = jax.random.split(key)
        g1 = jax.random.gamma(k1, self.concentration1, shape)
        g2 = jax.random.gamma(k2, self.concentration0, shape)
        return clamp_probs(g1 / (g1 + g2))

    def log_prob(self, value):
        a, b = self.concentration1, self.concentration0
        return (
            (a - 1) * jnp.log(value)
            + (b - 1) * jnp.log1p(-value)
            - (jsp.gammaln(a) + jsp.gammaln(b) - jsp.gammaln(a + b))
        )

    @property
    def mean(self):
        return self.concentration1 / (self.concentration1 + self.concentration0)

    @property
    def variance(self):
        total = self.concentration1 + self.concentration0
        return (
            self.concentration1
            * self.concentration0
            / (total**2 * (total + 1))
        )

    def entropy(self):
        a, b = self.concentration1, self.concentration0
        total = a + b
        return (
            jsp.gammaln(a)
            + jsp.gammaln(b)
            - jsp.gammaln(total)
            - (a - 1) * jsp.digamma(a)
            - (b - 1) * jsp.digamma(b)
            + (total - 2) * jsp.digamma(total)
        )

    @property
    def mode(self):
        """Mode (torch parity): nan where both concentrations <= 1."""
        c1 = jnp.clip(self.concentration1 - 1, 0, None)
        c0 = jnp.clip(self.concentration0 - 1, 0, None)
        return c1 / (c1 + c0)


class LogNormal(TransformedDistribution):
    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.positive
    has_rsample = True

    def __init__(self, loc=0.0, scale=1.0):
        base = Normal(loc, scale)
        self.loc, self.scale = base.loc, base.scale
        super().__init__(base, ExpTransform())
        self._pyro_init_args = ((loc, scale), ())

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return LogNormal(
            jnp.broadcast_to(self.loc, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
        )

    @property
    def mean(self):
        return jnp.exp(self.loc + self.scale**2 / 2)

    @property
    def variance(self):
        return jnp.expm1(self.scale**2) * jnp.exp(2 * self.loc + self.scale**2)

    def entropy(self):
        return (
            0.5 + 0.5 * math.log(2 * math.pi) + jnp.log(self.scale) + self.loc
        )

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.exp(self.loc - self.scale**2)


class Cauchy(UnivariateMixin, Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(broadcast_shape(jnp.shape(loc), jnp.shape(scale)))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = jax.random.uniform(key, shape, self.loc.dtype)
        return self.loc + self.scale * jnp.tan(math.pi * (u - 0.5))

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -math.log(math.pi) - jnp.log(self.scale) - jnp.log1p(z**2)

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.nan)

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.inf)

    def entropy(self):
        return jnp.broadcast_to(
            math.log(4 * math.pi) + jnp.log(self.scale), self.batch_shape
        )

    def cdf(self, value):
        return jnp.arctan((value - self.loc) / self.scale) / math.pi + 0.5

    def icdf(self, q):
        return self.loc + self.scale * jnp.tan(math.pi * (q - 0.5))

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape)


class HalfNormal(UnivariateMixin, Distribution):
    arg_constraints = {"scale": constraints.positive}
    support = constraints.positive
    has_rsample = True

    def __init__(self, scale=1.0):
        self.scale = jnp.asarray(scale, jnp.result_type(scale, jnp.float32))
        super().__init__(jnp.shape(scale))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        return jnp.abs(jax.random.normal(key, shape, self.scale.dtype)) * self.scale

    def log_prob(self, value):
        return (
            -(value**2) / (2 * self.scale**2)
            - jnp.log(self.scale)
            - 0.5 * math.log(2 * math.pi)
            + math.log(2.0)
        )

    @property
    def mean(self):
        return self.scale * math.sqrt(2 / math.pi)

    @property
    def variance(self):
        return self.scale**2 * (1 - 2 / math.pi)

    def cdf(self, value):
        return 2 * jsp.ndtr(value / self.scale) - 1

    def icdf(self, q):
        return self.scale * jsp.ndtri((q + 1) / 2)

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.zeros(self.batch_shape)


class HalfCauchy(UnivariateMixin, Distribution):
    arg_constraints = {"scale": constraints.positive}
    support = constraints.positive
    has_rsample = True

    def __init__(self, scale=1.0):
        self.scale = jnp.asarray(scale, jnp.result_type(scale, jnp.float32))
        super().__init__(jnp.shape(scale))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = jax.random.uniform(key, shape, self.scale.dtype)
        return self.scale * jnp.tan(math.pi * u / 2)

    def log_prob(self, value):
        return (
            math.log(2 / math.pi)
            - jnp.log(self.scale)
            - jnp.log1p((value / self.scale) ** 2)
        )

    @property
    def mean(self):
        return jnp.full(self.batch_shape, jnp.inf)

    @property
    def variance(self):
        return jnp.full(self.batch_shape, jnp.inf)

    def cdf(self, value):
        return 2 / math.pi * jnp.arctan(value / self.scale)

    def icdf(self, q):
        return self.scale * jnp.tan(math.pi * q / 2)

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.zeros(self.batch_shape)


class StudentT(UnivariateMixin, Distribution):
    arg_constraints = {
        "df": constraints.positive,
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, df, loc=0.0, scale=1.0):
        self.df, self.loc, self.scale = promote_shapes(
            jnp.asarray(df, jnp.result_type(df, jnp.float32)),
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(
            broadcast_shape(jnp.shape(df), jnp.shape(loc), jnp.shape(scale))
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        kn, kg = jax.random.split(key)
        z = jax.random.normal(kn, shape, self.loc.dtype)
        g = jax.random.gamma(kg, self.df / 2, shape) * 2 / self.df
        return self.loc + self.scale * z * jax.lax.rsqrt(g)

    def log_prob(self, value):
        df = self.df
        y = (value - self.loc) / self.scale
        z = (
            0.5 * jnp.log(df)
            + 0.5 * math.log(math.pi)
            + jsp.gammaln(0.5 * df)
            - jsp.gammaln(0.5 * (df + 1))
            + jnp.log(self.scale)
        )
        return -0.5 * (df + 1) * jnp.log1p(y**2 / df) - z

    @property
    def mean(self):
        return jnp.where(self.df > 1, self.loc, jnp.nan)

    @property
    def variance(self):
        v = self.scale**2 * self.df / (self.df - 2)
        return jnp.where(
            self.df > 2, v, jnp.where(self.df > 1, jnp.inf, jnp.nan)
        )

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape)


class Laplace(UnivariateMixin, Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(broadcast_shape(jnp.shape(loc), jnp.shape(scale)))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = jax.random.uniform(
            key, shape, self.loc.dtype, minval=-0.5 + 1e-7, maxval=0.5
        )
        return self.loc - self.scale * jnp.sign(u) * jnp.log1p(-2 * jnp.abs(u))

    def log_prob(self, value):
        return -jnp.abs(value - self.loc) / self.scale - jnp.log(
            2 * self.scale
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(2 * self.scale**2, self.batch_shape)

    def entropy(self):
        return jnp.broadcast_to(
            1 + jnp.log(2 * self.scale), self.batch_shape
        )

    def cdf(self, value):
        z = (value - self.loc) / self.scale
        return 0.5 - 0.5 * jnp.sign(z) * jnp.expm1(-jnp.abs(z))

    def icdf(self, q):
        term = q - 0.5
        return self.loc - self.scale * jnp.sign(term) * jnp.log1p(
            -2 * jnp.abs(term)
        )

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape)


class Gumbel(UnivariateMixin, Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(broadcast_shape(jnp.shape(loc), jnp.shape(scale)))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        return self.loc + self.scale * jax.random.gumbel(
            key, shape, self.loc.dtype
        )

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -(z + jnp.exp(-z)) - jnp.log(self.scale)

    @property
    def mean(self):
        return self.loc + self.scale * jnp.euler_gamma

    @property
    def variance(self):
        return jnp.broadcast_to(
            math.pi**2 / 6 * self.scale**2, self.batch_shape
        )

    def cdf(self, value):
        return jnp.exp(-jnp.exp(-(value - self.loc) / self.scale))

    def icdf(self, q):
        return self.loc - self.scale * jnp.log(-jnp.log(q))

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape)


class Logistic(UnivariateMixin, Distribution):
    """Ref ``pyro/distributions/logistic.py``."""

    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc=0.0, scale=1.0):
        self.loc, self.scale = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(broadcast_shape(jnp.shape(loc), jnp.shape(scale)))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        return self.loc + self.scale * jax.random.logistic(
            key, shape, self.loc.dtype
        )

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -z - 2 * jax.nn.softplus(-z) - jnp.log(self.scale)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            (self.scale * math.pi) ** 2 / 3, self.batch_shape
        )

    def cdf(self, value):
        return jax.nn.sigmoid((value - self.loc) / self.scale)

    def icdf(self, q):
        return self.loc + self.scale * (jnp.log(q) - jnp.log1p(-q))


class Weibull(UnivariateMixin, Distribution):
    arg_constraints = {
        "scale": constraints.positive,
        "concentration": constraints.positive,
    }
    support = constraints.positive
    has_rsample = True

    def __init__(self, scale, concentration):
        self.scale, self.concentration = promote_shapes(
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
            jnp.asarray(concentration, jnp.result_type(concentration, jnp.float32)),
        )
        super().__init__(
            broadcast_shape(jnp.shape(scale), jnp.shape(concentration))
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        e = jax.random.exponential(key, shape, self.scale.dtype)
        return self.scale * e ** (1.0 / self.concentration)

    def log_prob(self, value):
        k = self.concentration
        return (
            jnp.log(k / self.scale)
            + (k - 1) * (jnp.log(value) - jnp.log(self.scale))
            - (value / self.scale) ** k
        )

    @property
    def mean(self):
        return self.scale * jnp.exp(jsp.gammaln(1 + 1 / self.concentration))

    @property
    def variance(self):
        g1 = jnp.exp(jsp.gammaln(1 + 1 / self.concentration))
        g2 = jnp.exp(jsp.gammaln(1 + 2 / self.concentration))
        return self.scale**2 * (g2 - g1**2)


class Pareto(TransformedDistribution):
    arg_constraints = {
        "scale": constraints.positive,
        "alpha": constraints.positive,
    }
    has_rsample = True

    def __init__(self, scale, alpha):
        self.scale, self.alpha = promote_shapes(
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
            jnp.asarray(alpha, jnp.result_type(alpha, jnp.float32)),
        )
        base = Exponential(self.alpha)
        super().__init__(
            base, [ExpTransform(), AffineTransform(0.0, self.scale)]
        )
        self._pyro_init_args = ((scale, alpha), ())

    @property
    def support(self):  # type: ignore[override]
        return constraints.greater_than(self.scale)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return Pareto(
            jnp.broadcast_to(self.scale, batch_shape),
            jnp.broadcast_to(self.alpha, batch_shape),
        )

    @property
    def mean(self):
        return jnp.where(
            self.alpha > 1,
            self.alpha * self.scale / (self.alpha - 1),
            jnp.inf,
        )

    @property
    def variance(self):
        v = (
            self.scale**2
            * self.alpha
            / ((self.alpha - 1) ** 2 * (self.alpha - 2))
        )
        return jnp.where(self.alpha > 2, v, jnp.inf)


class VonMises(UnivariateMixin, Distribution):
    arg_constraints = {
        "loc": constraints.real,
        "concentration": constraints.positive,
    }
    support = constraints.interval(-math.pi, math.pi)

    def __init__(self, loc, concentration):
        self.loc, self.concentration = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(concentration, jnp.result_type(concentration, jnp.float32)),
        )
        super().__init__(
            broadcast_shape(jnp.shape(loc), jnp.shape(concentration))
        )

    def sample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        centered = von_mises_centered(
            key, jnp.broadcast_to(self.concentration, shape), shape,
            self.loc.dtype,
        )
        samp = centered + self.loc
        return (samp + math.pi) % (2 * math.pi) - math.pi

    def log_prob(self, value):
        from ..ops.special import log_i0

        return (
            self.concentration * jnp.cos(value - self.loc)
            - math.log(2 * math.pi)
            - log_i0(self.concentration)
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        from ..ops.special import log_i0, log_i1

        ratio = jnp.exp(log_i1(self.concentration) - log_i0(self.concentration))
        return jnp.broadcast_to(1 - ratio, self.batch_shape)

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape)


class SoftLaplace(UnivariateMixin, Distribution):
    """Smooth Laplace (ref ``pyro/distributions/softlaplace.py``)."""

    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc, scale):
        self.loc, self.scale = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(broadcast_shape(jnp.shape(loc), jnp.shape(scale)))

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return math.log(2 / math.pi) - jnp.log(self.scale) - jnp.logaddexp(z, -z)

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = jax.random.uniform(key, shape, self.loc.dtype)
        return self.icdf(u)

    def cdf(self, value):
        z = (value - self.loc) / self.scale
        return jnp.arctan(jnp.exp(z)) * (2 / math.pi)

    def icdf(self, value):
        return (
            jnp.log(jnp.tan(value * (math.pi / 2))) * self.scale + self.loc
        )

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(
            (math.pi / 2 * self.scale) ** 2, self.batch_shape
        )


class AsymmetricLaplace(UnivariateMixin, Distribution):
    """Ref ``pyro/distributions/asymmetriclaplace.py``."""

    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
        "asymmetry": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc, scale, asymmetry):
        self.loc, self.scale, self.asymmetry = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
            jnp.asarray(asymmetry, jnp.result_type(asymmetry, jnp.float32)),
        )
        super().__init__(
            broadcast_shape(
                jnp.shape(loc), jnp.shape(scale), jnp.shape(asymmetry)
            )
        )

    @property
    def left_scale(self):
        return self.scale * self.asymmetry

    @property
    def right_scale(self):
        return self.scale / self.asymmetry

    def log_prob(self, value):
        z = value - self.loc
        z = -jnp.abs(z) / jnp.where(z < 0, self.left_scale, self.right_scale)
        return z - jnp.log(self.left_scale + self.right_scale)

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        kl, kr = jax.random.split(key)
        u = jax.random.exponential(kl, shape, self.loc.dtype)
        v = jax.random.exponential(kr, shape, self.loc.dtype)
        return self.loc - self.left_scale * u + self.right_scale * v

    @property
    def mean(self):
        total = self.right_scale - self.left_scale
        return jnp.broadcast_to(self.loc + total, self.batch_shape)

    @property
    def variance(self):
        left, right = self.left_scale, self.right_scale
        return jnp.broadcast_to(
            left**2 + right**2 + left * right, self.batch_shape
        )


class Kumaraswamy(TransformedDistribution):
    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
    }
    support = constraints.unit_interval
    has_rsample = True

    def __init__(self, concentration1, concentration0):
        self.concentration1, self.concentration0 = promote_shapes(
            jnp.asarray(concentration1, jnp.result_type(concentration1, jnp.float32)),
            jnp.asarray(concentration0, jnp.result_type(concentration0, jnp.float32)),
        )
        base = Uniform(
            jnp.zeros(self.concentration1.shape),
            jnp.ones(self.concentration1.shape),
        )
        from .transforms import ComposeTransform, PowerTransform, AffineTransform

        transforms = [
            PowerTransform(1.0 / self.concentration0),
            AffineTransform(1.0, -1.0),
            PowerTransform(1.0 / self.concentration1),
        ]
        super().__init__(base, transforms)
        self._pyro_init_args = ((concentration1, concentration0), ())

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return Kumaraswamy(
            jnp.broadcast_to(self.concentration1, batch_shape),
            jnp.broadcast_to(self.concentration0, batch_shape),
        )

    @property
    def mean(self):
        a, b = self.concentration1, self.concentration0
        from ..ops.special import log_beta

        return b * jnp.exp(log_beta(1 + 1 / a, b))

    @property
    def variance(self):
        a, b = self.concentration1, self.concentration0
        from ..ops.special import log_beta

        m1 = b * jnp.exp(log_beta(1 + 1 / a, b))
        m2 = b * jnp.exp(log_beta(1 + 2 / a, b))
        return m2 - m1**2
