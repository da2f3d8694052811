"""Degenerate distributions: Delta, Unit, ImproperUniform.

Ref ``pyro/distributions/delta.py``, ``unit.py``, ``improper_uniform.py``.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import constraints
from .distribution import Distribution
from .util import broadcast_shape, sum_rightmost


class Delta(Distribution):
    """Point mass at ``v`` with optional importance weight ``log_density``.

    Ref ``pyro/distributions/delta.py``: used by ``pyro.deterministic``,
    AutoDelta guides, and infer_discrete.
    """

    arg_constraints = {
        "v": constraints.dependent,
        "log_density": constraints.real,
    }
    has_rsample = True

    def __init__(self, v, log_density=0.0, event_dim=0):
        v = jnp.asarray(v)
        if event_dim > v.ndim:
            raise ValueError(
                f"expected event_dim <= v.ndim, got {event_dim} > {v.ndim}"
            )
        batch_dim = v.ndim - event_dim
        batch_shape = v.shape[:batch_dim]
        event_shape = v.shape[batch_dim:]
        log_density = jnp.broadcast_to(
            jnp.asarray(log_density, jnp.result_type(float)), batch_shape
        )
        self.v = v
        self.log_density = log_density
        self._event_dim_arg = event_dim
        super().__init__(batch_shape, event_shape)
        self._pyro_init_args = (
            (v,),
            (("event_dim", event_dim), ("log_density", log_density)),
        )

    @property
    def support(self):  # type: ignore[override]
        if self.event_dim:
            return constraints.independent(constraints.real, self.event_dim)
        return constraints.real

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        return jnp.broadcast_to(self.v, shape)

    def log_prob(self, value):
        # two-sided broadcast: a plate may have expanded v beyond value
        # (e.g. a deterministic site inside a plate) or vice versa
        shape = jnp.broadcast_shapes(jnp.shape(self.v), jnp.shape(value))
        v = jnp.broadcast_to(self.v, shape)
        value = jnp.broadcast_to(value, shape)
        lp = jnp.where(value == v, 0.0, -jnp.inf)
        lp = sum_rightmost(lp, self._event_dim_arg)
        return lp + self.log_density

    @property
    def mean(self):
        return self.v

    @property
    def variance(self):
        return jnp.zeros(self.batch_shape + self.event_shape)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return Delta(
            jnp.broadcast_to(self.v, batch_shape + self.event_shape),
            jnp.broadcast_to(self.log_density, batch_shape),
            self._event_dim_arg,
        )


class Unit(Distribution):
    """Trivial distribution over the empty tensor, carrying ``log_factor``.

    Ref ``pyro/distributions/unit.py``: the sole use is ``pyro.factor``.
    """

    arg_constraints = {"log_factor": constraints.real}
    support = constraints.real

    def __init__(self, log_factor, *, has_rsample=None):
        self.log_factor = jnp.asarray(log_factor, jnp.result_type(float))
        if has_rsample is not None:
            self.has_rsample = has_rsample
        super().__init__(jnp.shape(self.log_factor), (0,))

    def sample(self, key, sample_shape=()):
        return jnp.zeros(self.shape(sample_shape))

    def rsample(self, key, sample_shape=()):
        return jnp.zeros(self.shape(sample_shape))

    def log_prob(self, value):
        shape = broadcast_shape(self.batch_shape, jnp.shape(value)[:-1])
        return jnp.broadcast_to(self.log_factor, shape)

    def expand(self, batch_shape, _instance=None):
        return Unit(jnp.broadcast_to(self.log_factor, tuple(batch_shape)))


class ImproperUniform(Distribution):
    """Zero log-density 'distribution' that cannot be sampled.

    Ref ``pyro/distributions/improper_uniform.py``: used as a prior in
    MAP/MCMC models where only the support matters.
    """

    arg_constraints = {}

    def __init__(self, support, batch_shape, event_shape):
        self._support = support
        super().__init__(tuple(batch_shape), tuple(event_shape))
        self._pyro_init_args = ((support, batch_shape, event_shape), ())

    @property
    def support(self):  # type: ignore[override]
        return self._support

    def sample(self, key, sample_shape=()):
        raise NotImplementedError(
            "ImproperUniform.sample is undefined; use a proper prior or "
            "condition this site"
        )

    def log_prob(self, value):
        shape = jnp.shape(value)[: jnp.ndim(value) - self.event_dim]
        return jnp.zeros(shape)

    def expand(self, batch_shape, _instance=None):
        return ImproperUniform(
            self._support, tuple(batch_shape), self.event_shape
        )
