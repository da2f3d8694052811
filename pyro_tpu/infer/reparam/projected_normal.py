"""ProjectedNormal reparam (ref
``pyro/infer/reparam/projected_normal.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.continuous import Normal
from ...distributions.delta import Delta
from ...distributions.multivariate import ProjectedNormal
from .reparam import Reparam


class ProjectedNormalReparam(Reparam):
    """Sample the ambient Gaussian as auxiliary; project deterministically."""

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        assert isinstance(fn, ProjectedNormal)
        if is_observed:
            return msg
        x = pyro.sample(
            f"{name}_normal",
            Normal(fn.concentration, 1.0).to_event(1),
        )
        value = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
        new_fn = Delta(value, event_dim=1)
        return {"fn": new_fn, "value": value, "is_observed": True}
