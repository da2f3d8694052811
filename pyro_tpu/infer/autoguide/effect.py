"""Effect-based autoguides (ref ``pyro/infer/autoguide/effect.py:25``):
``AutoMessenger``, ``AutoNormalMessenger:84``,
``AutoHierarchicalNormalMessenger:215``, ``AutoRegressiveMessenger:365``.

These run inside the model via ``GuideMessenger``, so guide structure
(including plates and data-dependence) mirrors the model automatically.
"""

from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp

from ...distributions import constraints
from ...distributions.continuous import Normal
from ...distributions.distribution import TransformedDistribution
from ...distributions.transforms import IdentityTransform, biject_to
from ...poutine.guide import GuideMessenger
from ...primitives import param as pyro_param
from .initialization import init_to_feasible, init_to_mean


class AutoMessenger(GuideMessenger):
    """Base: adds per-site param helpers (ref ``effect.py:25``)."""

    def __init__(self, model, *, amortized_plates=()):
        super().__init__(model)
        self._amortized_plates = tuple(amortized_plates)
        self._name = type(self).__name__

    def call(self, *args, **kwargs):
        """Sample-dict call for use as a guide in SVI."""
        return self(*args, **kwargs)


class AutoNormalMessenger(AutoMessenger):
    """Mean-field normal posterior per site in unconstrained space
    (ref ``effect.py:84``)."""

    def __init__(
        self,
        model,
        *,
        init_loc_fn=init_to_mean,
        init_scale: float = 0.1,
        amortized_plates=(),
    ):
        super().__init__(model, amortized_plates=amortized_plates)
        self.init_loc_fn = init_loc_fn
        self._init_scale = init_scale

    def get_posterior(self, name: str, prior):
        transform = biject_to(prior.support)
        loc, scale = self._get_params(name, prior)
        base = Normal(loc, scale).to_event(
            _unconstrained_event_dim(transform, prior)
        )
        if isinstance(transform, IdentityTransform):
            return base
        return TransformedDistribution(base, transform)

    def _get_params(self, name: str, prior):
        transform = biject_to(prior.support)
        init_value = self.init_loc_fn({"name": name, "fn": prior})
        unconstrained = transform.inv(init_value)
        loc = pyro_param(f"{self._name}.locs.{name}", unconstrained)
        scale = pyro_param(
            f"{self._name}.scales.{name}",
            jnp.full(jnp.shape(unconstrained), self._init_scale),
            constraint=constraints.softplus_positive,
        )
        return loc, scale


def _unconstrained_event_dim(transform, prior) -> int:
    return max(
        transform.domain.event_dim,
        prior.event_dim
        - (transform.codomain.event_dim - transform.domain.event_dim),
    )


class AutoHierarchicalNormalMessenger(AutoNormalMessenger):
    """Posterior loc interpolates the prior mean with a learned offset
    (ref ``effect.py:215``): loc = weight * prior_mean + offset."""

    def __init__(
        self,
        model,
        *,
        init_loc_fn=init_to_mean,
        init_scale: float = 0.1,
        init_weight: float = 1.0,
        hierarchical_sites=None,
        amortized_plates=(),
    ):
        super().__init__(
            model,
            init_loc_fn=init_loc_fn,
            init_scale=init_scale,
            amortized_plates=amortized_plates,
        )
        self._init_weight = init_weight
        self._hierarchical_sites = hierarchical_sites

    def get_posterior(self, name: str, prior):
        do_hier = (
            self._hierarchical_sites is None
            or name in self._hierarchical_sites
        )
        if not do_hier:
            return super().get_posterior(name, prior)
        transform = biject_to(prior.support)
        event_dim = _unconstrained_event_dim(transform, prior)
        init_value = self.init_loc_fn({"name": name, "fn": prior})
        unconstrained = transform.inv(init_value)
        weight = pyro_param(
            f"{self._name}.weights.{name}",
            jnp.asarray(self._init_weight),
            constraint=constraints.positive,
        )
        offset = pyro_param(
            f"{self._name}.offsets.{name}", jnp.zeros_like(unconstrained)
        )
        scale = pyro_param(
            f"{self._name}.scales.{name}",
            jnp.full(jnp.shape(unconstrained), self._init_scale),
            constraint=constraints.softplus_positive,
        )
        try:
            prior_mean = transform.inv(prior.mean)
        except (NotImplementedError, ValueError):
            prior_mean = jnp.zeros_like(unconstrained)
        loc = weight * prior_mean + offset
        base = Normal(loc, scale).to_event(event_dim)
        if isinstance(transform, IdentityTransform):
            return base
        return TransformedDistribution(base, transform)


class AutoRegressiveMessenger(AutoMessenger):
    """Posterior = prior sample shifted by a learned affine in
    unconstrained space (ref ``effect.py:365``)."""

    def __init__(self, model, *, init_scale: float = 0.1, amortized_plates=()):
        super().__init__(model, amortized_plates=amortized_plates)
        self._init_scale = init_scale

    def get_posterior(self, name: str, prior):
        transform = biject_to(prior.support)
        event_dim = _unconstrained_event_dim(transform, prior)
        shape = prior.shape()
        # unconstrained shape
        u_shape = jnp.shape(
            transform.inv(jnp.ones(shape) * 0.5)
            if type(prior.support) is not type(constraints.real)
            else jnp.zeros(shape)
        )
        loc = pyro_param(f"{self._name}.locs.{name}", jnp.zeros(u_shape))
        scale = pyro_param(
            f"{self._name}.scales.{name}",
            jnp.full(u_shape, self._init_scale),
            constraint=constraints.softplus_positive,
        )
        from ...distributions.transforms import AffineTransform, ComposeTransform

        affine = AffineTransform(loc, scale, event_dim=event_dim)
        if isinstance(transform, IdentityTransform):
            return TransformedDistribution(prior, affine)
        return TransformedDistribution(
            prior, ComposeTransform([transform.inv, affine, transform])
        )
