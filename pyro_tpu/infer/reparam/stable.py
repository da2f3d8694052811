"""Auxiliary-variable reparam for alpha-stable sites
(ref ``pyro/infer/reparam/stable.py``).

The Chambers-Mallows-Stuck construction expresses a Stable draw as a
deterministic function of Uniform(-pi/2, pi/2) and Exponential(1)
auxiliaries, making the otherwise-intractable density amenable to
SVI/HMC (the aux densities are tractable; the site becomes a Delta).
"""

from __future__ import annotations

import math

import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.continuous import Exponential, Uniform
from ...distributions.delta import Delta
from ...distributions.extra import Stable
from .reparam import Reparam


class StableReparam(Reparam):
    """Ref ``stable.py:StableReparam``."""

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        from ...distributions.distribution import Independent

        event_dim = 0
        while isinstance(fn, Independent):
            event_dim += fn.reinterpreted_batch_ndims
            fn = fn.base_dist
        assert isinstance(fn, Stable), (
            f"StableReparam at '{name}' requires a Stable distribution"
        )
        if is_observed:
            raise NotImplementedError(
                "StableReparam does not support observed sites; use "
                "SymmetricStableReparam-style likelihoods instead"
            )
        shape = fn.batch_shape
        half_pi = math.pi / 2
        u = pyro.sample(
            f"{name}_uniform",
            Uniform(
                jnp.full(shape, -half_pi), jnp.full(shape, half_pi)
            ).to_event(event_dim),
        )
        e = pyro.sample(
            f"{name}_exponential",
            Exponential(jnp.ones(shape)).to_event(event_dim),
        )
        a, b = fn.stability, fn.skew
        V, W = u, jnp.clip(e, 1e-20)
        B = jnp.arctan(b * jnp.tan(half_pi * a)) / a
        S = (1 + b**2 * jnp.tan(half_pi * a) ** 2) ** (1 / (2 * a))
        X = (
            S
            * jnp.sin(a * (V + B))
            / jnp.cos(V) ** (1 / a)
            * (jnp.cos(V - a * (V + B)) / W) ** ((1 - a) / a)
        )
        if fn.coords == "S0":
            X = X - b * jnp.tan(half_pi * a)
        value = fn.loc + fn.scale * X
        new_fn = Delta(value, event_dim=event_dim)
        return {"fn": new_fn, "value": value, "is_observed": True}


class SymmetricStableReparam(StableReparam):
    """Ref ``stable.py:SymmetricStableReparam`` — alias implementation for
    beta=0 sites (same auxiliary construction)."""


class LatentStableReparam(StableReparam):
    """The proper name for the latent-site CMS reparameterization
    (ref ``stable.py:16`` ``LatentStableReparam``): our
    :class:`StableReparam` implements exactly this construction (latent
    sites only), so this is its canonical alias."""
