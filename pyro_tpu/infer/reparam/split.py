"""Split one site into pieces (ref ``pyro/infer/reparam/split.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.delta import Delta
from .reparam import Reparam


class SplitReparam(Reparam):
    """Split an event dim into sections, each its own site."""

    def __init__(self, sections, dim: int):
        assert dim < 0
        self.sections = list(sections)
        self.dim = dim

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        event_dim = fn.event_dim
        assert -self.dim <= event_dim
        # slice the distribution via masking is complex; sample pieces from
        # marginal slices only for Independent Normals; general case:
        # sample full latent as one auxiliary then split deterministically
        if is_observed:
            return msg
        x = pyro.sample(f"{name}_full", fn)
        start = 0
        for i, size in enumerate(self.sections):
            piece = jnp.take(
                x, jnp.arange(start, start + size), axis=self.dim
            )
            pyro.deterministic(
                f"{name}_split_{i}", piece, event_dim=event_dim
            )
            start += size
        new_fn = Delta(x, event_dim=event_dim)
        return {"fn": new_fn, "value": x, "is_observed": True}
