"""Mixture distributions.

Ref ``torch.distributions.MixtureSameFamily`` (re-exported by pyro) and
``pyro/distributions/mixture.py`` (MaskedMixture).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from . import constraints
from .discrete import Categorical
from .distribution import Distribution
from .util import broadcast_shape


class MixtureSameFamily(Distribution):
    """Mixture over the rightmost batch dim of a component distribution."""

    arg_constraints = {}

    def __init__(self, mixture_distribution: Categorical, component_distribution: Distribution):
        self.mixture_distribution = mixture_distribution
        self.component_distribution = component_distribution
        km = mixture_distribution._num_events
        kd = component_distribution.batch_shape[-1]
        if km != kd:
            raise ValueError(
                f"mixture has {km} components, component dist has {kd}"
            )
        batch_shape = broadcast_shape(
            mixture_distribution.batch_shape,
            component_distribution.batch_shape[:-1],
        )
        super().__init__(
            batch_shape, component_distribution.event_shape
        )

    @property
    def support(self):  # type: ignore[override]
        return self.component_distribution.support

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        idx = self.mixture_distribution.sample(k1, sample_shape)
        comps = self.component_distribution.expand(
            self.batch_shape + self.component_distribution.batch_shape[-1:]
        ).sample(k2, sample_shape)
        idx_exp = idx.reshape(
            idx.shape + (1,) * (1 + len(self.event_shape))
        )
        gathered = jnp.take_along_axis(
            comps, idx_exp.astype(jnp.int32), axis=len(idx.shape)
        )
        return jnp.squeeze(gathered, axis=len(idx.shape))

    def log_prob(self, value):
        value_exp = jnp.expand_dims(value, -1 - len(self.event_shape))
        comp_lp = self.component_distribution.log_prob(value_exp)
        mix_logits = self.mixture_distribution.logits
        return logsumexp(comp_lp + mix_logits, axis=-1)

    @property
    def mean(self):
        probs = self.mixture_distribution.probs
        probs = probs.reshape(probs.shape + (1,) * len(self.event_shape))
        return jnp.sum(
            probs * self.component_distribution.mean,
            axis=-1 - len(self.event_shape),
        )

    @property
    def variance(self):
        probs = self.mixture_distribution.probs
        probs = probs.reshape(probs.shape + (1,) * len(self.event_shape))
        axis = -1 - len(self.event_shape)
        mean_cond_var = jnp.sum(
            probs * self.component_distribution.variance, axis=axis
        )
        var_cond_mean = jnp.sum(
            probs
            * (self.component_distribution.mean - jnp.expand_dims(self.mean, axis))
            ** 2,
            axis=axis,
        )
        return mean_cond_var + var_cond_mean

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        k = self.component_distribution.batch_shape[-1]
        return MixtureSameFamily(
            self.mixture_distribution.expand(batch_shape),
            self.component_distribution.expand(batch_shape + (k,)),
        )


class MaskedMixture(Distribution):
    """Elementwise mixture of two distributions selected by a boolean mask
    (ref ``pyro/distributions/mixture.py:MaskedMixture``)."""

    arg_constraints = {}

    def __init__(self, mask, component0: Distribution, component1: Distribution):
        self.mask = jnp.asarray(mask).astype(bool)
        if component0.event_shape != component1.event_shape:
            raise ValueError(
                f"components event_shape disagree: "
                f"{component0.event_shape} vs {component1.event_shape}"
            )
        batch_shape = broadcast_shape(
            jnp.shape(mask), component0.batch_shape, component1.batch_shape
        )
        self.component0 = (
            component0.expand(batch_shape)
            if component0.batch_shape != batch_shape
            else component0
        )
        self.component1 = (
            component1.expand(batch_shape)
            if component1.batch_shape != batch_shape
            else component1
        )
        super().__init__(batch_shape, component0.event_shape)

    @property
    def has_rsample(self):  # type: ignore[override]
        return self.component0.has_rsample and self.component1.has_rsample

    @property
    def support(self):  # type: ignore[override]
        return self.component0.support

    def sample(self, key, sample_shape=()):
        k0, k1 = jax.random.split(key)
        v0 = self.component0.sample(k0, sample_shape)
        v1 = self.component1.sample(k1, sample_shape)
        mask = self.mask.reshape(
            self.mask.shape + (1,) * len(self.event_shape)
        )
        return jnp.where(mask, v1, v0)

    def rsample(self, key, sample_shape=()):
        k0, k1 = jax.random.split(key)
        v0 = self.component0.rsample(k0, sample_shape)
        v1 = self.component1.rsample(k1, sample_shape)
        mask = self.mask.reshape(
            self.mask.shape + (1,) * len(self.event_shape)
        )
        return jnp.where(mask, v1, v0)

    def log_prob(self, value):
        lp0 = self.component0.log_prob(value)
        lp1 = self.component1.log_prob(value)
        return jnp.where(self.mask, lp1, lp0)

    @property
    def mean(self):
        mask = self.mask.reshape(
            self.mask.shape + (1,) * len(self.event_shape)
        )
        return jnp.where(mask, self.component1.mean, self.component0.mean)

    @property
    def variance(self):
        mask = self.mask.reshape(
            self.mask.shape + (1,) * len(self.event_shape)
        )
        return jnp.where(
            mask, self.component1.variance, self.component0.variance
        )

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return MaskedMixture(
            jnp.broadcast_to(self.mask, batch_shape),
            self.component0.expand(batch_shape),
            self.component1.expand(batch_shape),
        )
