"""StudentT as a Gamma-mixture of Normals (ref
``pyro/infer/reparam/studentt.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.continuous import Gamma, Normal, StudentT
from ...distributions.distribution import Independent
from .reparam import Reparam


class StudentTReparam(Reparam):
    """t(df, loc, scale) == Normal(loc, scale/sqrt(g)), g ~ Gamma(df/2, df/2):
    samples the precision-mixing auxiliary and returns the conditional
    Normal, which downstream machinery (e.g. LinearHMMReparam) can use."""

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        event_dim = 0
        while isinstance(fn, Independent):
            event_dim += fn.reinterpreted_batch_ndims
            fn = fn.base_dist
        assert isinstance(fn, StudentT)
        half_df = fn.df * 0.5
        gamma = pyro.sample(
            f"{name}_gamma",
            Gamma(half_df, half_df).expand(fn.batch_shape).to_event(event_dim),
        )
        scale = fn.scale * jnp.sqrt(1.0 / gamma)
        new_fn = Normal(fn.loc, scale)
        if event_dim:
            new_fn = new_fn.to_event(event_dim)
        return {"fn": new_fn, "value": value, "is_observed": is_observed}
