"""Zero-inflated distributions (ref ``pyro/distributions/zero_inflated.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constraints
from .discrete import NegativeBinomial, Poisson
from .distribution import Distribution
from .util import (
    broadcast_shape,
    clamp_probs,
    lazy_property,
    logits_to_probs,
    probs_to_logits,
)


class ZeroInflatedDistribution(Distribution):
    """Generic zero inflation of a base distribution (ref
    ``zero_inflated.py:17``).  Pass exactly one of ``gate`` (probability of
    extra zeros) or ``gate_logits``."""

    arg_constraints = {
        "gate": constraints.unit_interval,
        "gate_logits": constraints.real,
    }
    is_discrete = True

    def __init__(self, base_dist: Distribution, *, gate=None, gate_logits=None):
        if (gate is None) == (gate_logits is None):
            raise ValueError(
                "pass exactly one of gate or gate_logits"
            )
        if base_dist.event_shape != ():
            raise ValueError(
                "ZeroInflatedDistribution expects a univariate base"
            )
        if gate is not None:
            self._gate = jnp.asarray(gate, jnp.result_type(gate, jnp.float32))
            self._gate_logits = None
            gshape = jnp.shape(self._gate)
        else:
            self._gate_logits = jnp.asarray(
                gate_logits, jnp.result_type(gate_logits, jnp.float32)
            )
            self._gate = None
            gshape = jnp.shape(self._gate_logits)
        batch_shape = broadcast_shape(gshape, base_dist.batch_shape)
        self.base_dist = base_dist.expand(batch_shape)
        super().__init__(batch_shape)

    @lazy_property
    def gate(self):
        return (
            self._gate
            if self._gate is not None
            else logits_to_probs(self._gate_logits, is_binary=True)
        )

    @lazy_property
    def gate_logits(self):
        return (
            self._gate_logits
            if self._gate_logits is not None
            else probs_to_logits(self._gate, is_binary=True)
        )

    @property
    def support(self):  # type: ignore[override]
        return self.base_dist.support

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = self.shape(sample_shape)
        mask = jax.random.uniform(k1, shape) < self.gate
        samples = self.base_dist.sample(k2, sample_shape)
        return jnp.where(mask, jnp.zeros_like(samples), samples)

    def log_prob(self, value):
        gate = clamp_probs(self.gate)
        base_lp = self.base_dist.log_prob(value)
        log_prob = jnp.log1p(-gate) + base_lp
        zero_lp = jnp.logaddexp(jnp.log(gate), log_prob)
        return jnp.where(value == 0, zero_lp, log_prob)

    @property
    def mean(self):
        return (1 - self.gate) * self.base_dist.mean

    @property
    def variance(self):
        m = self.base_dist.mean
        return (1 - self.gate) * (
            self.base_dist.variance + m**2
        ) - self.mean**2

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        gate_kw = (
            {"gate": jnp.broadcast_to(self.gate, batch_shape)}
            if self._gate is not None
            else {
                "gate_logits": jnp.broadcast_to(
                    self._gate_logits, batch_shape
                )
            }
        )
        return ZeroInflatedDistribution(
            self.base_dist.expand(batch_shape), **gate_kw
        )


class ZeroInflatedPoisson(ZeroInflatedDistribution):
    """Ref ``zero_inflated.py:ZeroInflatedPoisson``."""

    arg_constraints = {
        "gate": constraints.unit_interval,
        "rate": constraints.positive,
    }

    def __init__(self, rate, *, gate=None, gate_logits=None):
        super().__init__(
            Poisson(rate), gate=gate, gate_logits=gate_logits
        )
        self.rate = self.base_dist.rate


class ZeroInflatedNegativeBinomial(ZeroInflatedDistribution):
    """Ref ``zero_inflated.py:ZeroInflatedNegativeBinomial``."""

    def __init__(
        self, total_count, *, probs=None, logits=None, gate=None, gate_logits=None
    ):
        super().__init__(
            NegativeBinomial(total_count, probs=probs, logits=logits),
            gate=gate,
            gate_logits=gate_logits,
        )
        self.total_count = self.base_dist.total_count
