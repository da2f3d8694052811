"""Neural transport reparameterization (ref
``pyro/infer/reparam/neutra.py``; Hoffman et al. 2019).

Uses a trained AutoContinuous guide to 'neutralize' bad posterior geometry
for HMC: latents are sampled in the guide's whitened space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.continuous import Normal
from ...distributions.delta import Delta
from .reparam import Reparam


class NeuTraReparam(Reparam):
    def __init__(self, guide):
        from ...infer.autoguide.guides import AutoContinuous

        if not isinstance(guide, AutoContinuous):
            raise TypeError(
                "NeuTraReparam expects a trained AutoContinuous guide"
            )
        self.guide = guide
        self.transform = None
        self.x_unconstrained = {}

    def _get_posterior_transform(self):
        posterior = self.guide.get_posterior()
        # transform from white noise to posterior samples
        return posterior

    def reparam(self, fn=None):
        from ...poutine.reparam_messenger import reparam as reparam_handler

        return reparam_handler(
            fn, config=lambda msg: self if not msg["is_observed"] else None
        )

    def transform_sample(self, latent):
        """Map flat whitened latent(s) back to constrained site values
        (ref ``neutra.py:transform_sample``)."""
        unconstrained = self.guide._unravel_batched(latent)
        return {
            name: self.guide._transforms[name](u)
            for name, u in unconstrained.items()
        }

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        if is_observed:
            return msg
        if not self.x_unconstrained:
            # sample shared white noise once per trace, transform via guide
            posterior = self.guide.get_posterior()
            z = pyro.sample(
                "_neutra_latent",
                posterior,
                infer={"is_auxiliary": True},
            )
            unconstrained = self.guide._unravel_batched(z)
            self.x_unconstrained = dict(unconstrained)
        u = self.x_unconstrained.pop(name)
        t = self.guide._transforms[name]
        value = t(u)
        new_fn = Delta(value, event_dim=fn.event_dim)
        return {"fn": new_fn, "value": value, "is_observed": True}
