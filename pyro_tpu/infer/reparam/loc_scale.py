"""Centered <-> non-centered interpolation (ref
``pyro/infer/reparam/loc_scale.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.delta import Delta
from .reparam import Reparam


class LocScaleReparam(Reparam):
    """For loc-scale families: ``centered in [0,1]`` interpolates between
    centered (1) and fully non-centered (0) parameterizations; ``None``
    learns a per-coordinate value (ref ``loc_scale.py:20``)."""

    def __init__(self, centered=0.0, shape_params=()):
        assert centered is None or 0.0 <= float(centered) <= 1.0 if not hasattr(centered, "shape") else True
        self.centered = centered
        self.shape_params = tuple(shape_params)

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        if is_observed:
            return msg
        centered = self.centered
        event_shape = fn.event_shape
        fn, event_dim = _unwrap_independent(fn)
        if centered is None:
            from ...distributions import constraints

            centered = pyro.param(
                f"{name}_centered",
                jnp.full(fn.batch_shape + event_shape, 0.5),
                constraint=constraints.unit_interval,
                event_dim=0,
            )
        params = {k: getattr(fn, k) for k in self.shape_params}
        params["loc"] = fn.loc * centered
        params["scale"] = fn.scale**centered
        decentered_fn = type(fn)(**params)
        if event_dim:
            decentered_fn = decentered_fn.to_event(event_dim)
        x = pyro.sample(f"{name}_decentered", decentered_fn)
        value = fn.loc + fn.scale ** (1 - centered) * (
            x - fn.loc * centered
        )
        new_fn = Delta(value, event_dim=event_dim)
        return {"fn": new_fn, "value": value, "is_observed": True}


def _unwrap_independent(fn):
    from ...distributions.distribution import Independent

    event_dim = 0
    while isinstance(fn, Independent):
        event_dim += fn.reinterpreted_batch_ndims
        fn = fn.base_dist
    return fn, event_dim
