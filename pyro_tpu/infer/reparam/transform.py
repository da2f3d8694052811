"""TransformedDistribution reparam (ref
``pyro/infer/reparam/transform.py``)."""

from __future__ import annotations

from ... import primitives as pyro
from ...distributions.delta import Delta
from ...distributions.distribution import TransformedDistribution
from .reparam import Reparam


class TransformReparam(Reparam):
    """Sample the base distribution as an auxiliary site and push it
    through the transforms deterministically."""

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        assert isinstance(fn, TransformedDistribution), (
            f"TransformReparam at site '{name}' requires a "
            "TransformedDistribution"
        )
        if is_observed:
            return msg
        x = pyro.sample(f"{name}_base", fn.base_dist)
        for t in fn.transforms:
            x = t(x)
        new_fn = Delta(x, event_dim=fn.event_dim)
        return {"fn": new_fn, "value": x, "is_observed": True}
