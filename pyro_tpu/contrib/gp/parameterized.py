"""Parameterized base for GP modules.

Ref ``pyro/contrib/gp/parameterized.py:57``: attributes registered as
parameters become ``pyro.param`` sites (with constraints) or, given a
prior, ``pyro.sample`` sites with an autoguide (Delta/Normal).  JAX
version: definitions are stored per instance and materialized through the
effect runtime on access, so everything trains under the jitted SVI step.
"""

from __future__ import annotations

import itertools
from typing import Dict, Optional

import jax.numpy as jnp

from ...distributions import constraints
from ...distributions.delta import Delta
from ...distributions.transforms import biject_to
from ...primitives import param as pyro_param
from ...primitives import sample as pyro_sample

_COUNTERS: Dict[str, "itertools.count"] = {}


def _autoname(cls_name: str) -> str:
    c = _COUNTERS.setdefault(cls_name, itertools.count())
    i = next(c)
    return cls_name if i == 0 else f"{cls_name}_{i}"


class Parameterized:
    """Ref ``parameterized.py:57``."""

    def __init__(self, name: Optional[str] = None):
        self._pyro_name = name or _autoname(type(self).__name__)
        self._param_defs: Dict[str, tuple] = {}
        self._priors: Dict[str, object] = {}
        self._guides: Dict[str, str] = {}
        self._mode = "model"

    def _register_param(self, name, init, constraint=constraints.real):
        self._param_defs[name] = (jnp.asarray(init), constraint)

    def set_prior(self, name, prior) -> None:
        if name not in self._param_defs:
            raise KeyError(f"no parameter '{name}' registered")
        self._priors[name] = prior
        self._guides.setdefault(name, "Delta")

    def autoguide(self, name, guide_type: str = "Delta") -> None:
        """Choose the per-site guide family ('Delta' or 'Normal')."""
        self._guides[name] = guide_type

    @property
    def mode(self) -> str:
        return self._mode

    def set_mode(self, mode: str) -> None:
        assert mode in ("model", "guide")
        self._mode = mode
        for child in self.__dict__.values():
            if isinstance(child, Parameterized):
                child.set_mode(mode)

    def __getattr__(self, name):
        defs = self.__dict__.get("_param_defs")
        if defs is not None and name in defs:
            return self._materialize(name)
        raise AttributeError(
            f"{type(self).__name__} has no attribute '{name}'"
        )

    def _materialize(self, name):
        init, constraint = self._param_defs[name]
        full = f"{self._pyro_name}.{name}"
        prior = self._priors.get(name)
        if prior is None:
            return pyro_param(full, init, constraint=constraint)
        if self._mode == "model":
            return pyro_sample(full, prior)
        # guide mode
        guide_type = self._guides.get(name, "Delta")
        t = biject_to(prior.support)
        loc = pyro_param(f"{full}_map", t.inv(init))
        if guide_type == "Delta":
            value = t(loc)
            return pyro_sample(
                full, Delta(value, event_dim=prior.event_dim)
            )
        from ...distributions.continuous import Normal
        from ...distributions.distribution import TransformedDistribution

        scale = pyro_param(
            f"{full}_scale",
            jnp.full(jnp.shape(loc), 0.1),
            constraint=constraints.softplus_positive,
        )
        base = Normal(loc, scale).to_event(jnp.ndim(loc))
        return pyro_sample(full, TransformedDistribution(base, t))
