"""LinearHMM -> GaussianHMM reparameterization (ref
``pyro/infer/reparam/hmm.py``).

A ``LinearHMM`` whose init/trans/obs noises are non-Gaussian (StudentT,
transformed, ...) is rewritten into a tractable ``GaussianHMM`` by applying
component reparams that produce conditionally-Gaussian noise, and by
pulling observation transforms onto the data.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ...distributions.continuous import Normal
from ...distributions.distribution import (
    Independent,
    TransformedDistribution,
)
from ...distributions.hmm import GaussianHMM, LinearHMM
from ...distributions.multivariate import MultivariateNormal
from .reparam import Reparam


def _is_gaussian(d) -> bool:
    base = d
    while isinstance(base, Independent):
        base = base.base_dist
    return isinstance(base, (Normal, MultivariateNormal))


class LinearHMMReparam(Reparam):
    """Ref ``reparam/hmm.py:LinearHMMReparam``."""

    def __init__(
        self,
        init: Optional[Reparam] = None,
        trans: Optional[Reparam] = None,
        obs: Optional[Reparam] = None,
    ):
        self.init = init
        self.trans = trans
        self.obs = obs

    def _reparam_component(self, name, dist, reparam):
        if _is_gaussian(dist):
            return dist
        if reparam is None:
            raise ValueError(
                f"LinearHMM component '{name}' is non-Gaussian; supply a "
                "component reparam (e.g. StudentTReparam)"
            )
        new_msg = reparam.apply(
            {
                "name": name,
                "fn": dist,
                "value": None,
                "is_observed": False,
                "rng_key": None,
            }
        )
        return new_msg["fn"]

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        base = fn
        while isinstance(base, Independent):
            base = base.base_dist
        assert isinstance(base, LinearHMM), (
            f"LinearHMMReparam at '{name}' requires a LinearHMM"
        )
        init_dist = self._reparam_component(
            f"{name}_init", base.initial_dist, self.init
        )
        trans_dist = self._reparam_component(
            f"{name}_trans", base.transition_dist, self.trans
        )
        obs_dist = self._reparam_component(
            f"{name}_obs", base.observation_dist, self.obs
        )
        hmm = GaussianHMM(
            _as_event1(init_dist),
            base.transition_matrix,
            _as_event1(trans_dist),
            base.observation_matrix,
            _as_event1(obs_dist),
            duration=base.duration,
        )
        # pull observation transforms onto the data
        if base.transforms:
            from ...distributions.transforms import ComposeTransform

            t = ComposeTransform(list(base.transforms))
            if is_observed and value is not None:
                value = t.inv(value)
                # the Jacobian of the data transform is constant wrt latents
                # but not wrt any transform parameters; include it
                hmm = TransformedDistribution(hmm, t)
                value = t(value)
                return {"fn": hmm, "value": value, "is_observed": True}
            hmm = TransformedDistribution(hmm, t)
        return {"fn": hmm, "value": value, "is_observed": is_observed}


def _as_event1(d):
    """Ensure event_dim == 1 (Normal components arrive event_dim 0 or 1)."""
    if d.event_dim == 1:
        return d
    if d.event_dim == 0:
        return d.to_event(1)
    raise ValueError(f"unexpected event_dim {d.event_dim}")
