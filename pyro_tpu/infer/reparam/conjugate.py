"""Conjugate-update reparameterization (ref
``pyro/infer/reparam/conjugate.py``).

Replaces a prior site by its conjugate update against an (approximate)
likelihood ``guide``, leaving an importance-weighted Delta so downstream
densities stay exact: with p(z) the prior, q(z|x) the guide, and u(z) the
conjugate-updated distribution, the Delta's log-density carries
``log_normalizer - log q(z|x)``.
"""

from __future__ import annotations

from ... import primitives as pyro
from ...distributions.delta import Delta
from ...distributions.distribution import Distribution
from .reparam import Reparam


class ConjugateReparam(Reparam):
    """Ref ``conjugate.py:11``."""

    def __init__(self, guide):
        self.guide = guide

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        guide_dist = self.guide
        if not isinstance(guide_dist, Distribution):
            guide_dist = guide_dist()
        assert isinstance(guide_dist, Distribution)

        updated, log_normalizer = fn.conjugate_update(guide_dist)
        if not updated.has_rsample:
            raise NotImplementedError(
                "ConjugateReparam supports only reparameterized "
                f"distributions, but got {type(updated).__name__}"
            )
        value = pyro.sample(
            f"{name}_updated",
            updated,
            obs=value if is_observed else None,
            infer={"is_auxiliary": True, "_do_not_trace": True},
        )

        # importance weight p(z)/u(z) = normalizer / q(z|x)   (ref Eqn 1)
        log_density = log_normalizer - guide_dist.log_prob(value)
        new_fn = Delta(
            value, log_density=log_density, event_dim=fn.event_dim
        )
        return {"fn": new_fn, "value": value, "is_observed": True}
