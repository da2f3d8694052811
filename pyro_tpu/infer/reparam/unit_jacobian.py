"""Unit-Jacobian transform reparam (ref
``pyro/infer/reparam/unit_jacobian.py``)."""

from __future__ import annotations

from ... import primitives as pyro
from ...distributions.delta import Delta
from ...distributions.distribution import TransformedDistribution
from ...distributions.transforms import ComposeTransform
from .reparam import Reparam


class UnitJacobianReparam(Reparam):
    """Reparameterize through a volume-preserving transform (e.g. Haar or
    DCT): the latent is sampled in transformed coordinates."""

    def __init__(self, transform, suffix: str = "transformed", *, experimental_allow_batch: bool = False):
        self.transform = transform
        self.suffix = suffix

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        if is_observed:
            return msg
        t = self.transform
        transformed_fn = TransformedDistribution(fn, [t])
        x_t = pyro.sample(f"{name}_{self.suffix}", transformed_fn)
        x = t.inv(x_t)
        new_fn = Delta(x, event_dim=fn.event_dim)
        return {"fn": new_fn, "value": x, "is_observed": True}
