"""Gumbel-softmax reparam of RelaxedOneHotCategorical sites (ref
``pyro/infer/reparam/softmax.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.delta import Delta
from ...distributions.extra import RelaxedOneHotCategorical
from ...distributions.continuous import Uniform
from ...distributions.util import clamp_probs
from .loc_scale import _unwrap_independent
from .reparam import Reparam


class GumbelSoftmaxReparam(Reparam):
    """Reparametrizer for :class:`RelaxedOneHotCategorical` latents (ref
    ``softmax.py:12``): the auxiliary latent is parameter-free
    ``Uniform(0,1)`` noise u per class; the value is
    ``softmax((logits - log(-log u)) / temperature)``.  Useful for turning
    multimodal posteriors unimodal; latents only, not likelihoods."""

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        fn, extra_event_dim = _unwrap_independent(fn)
        assert isinstance(fn, RelaxedOneHotCategorical)
        if is_observed:
            raise NotImplementedError(
                "GumbelSoftmaxReparam does not support observe statements"
                f" (at sample site {name!r})"
            )

        # Differentiably invert the transform for conditioned values
        # (ref softmax.py:38-41): u = exp(-exp(logits - T*log(value))).
        u = None
        if value is not None:
            logits = jnp.log(clamp_probs(value)) * fn.temperature
            u = jnp.exp(-jnp.exp(fn.logits - logits))

        proto = fn.logits
        new_fn = Uniform(jnp.zeros_like(proto), jnp.ones_like(proto))
        u = pyro.sample(
            f"{name}_uniform",
            new_fn.to_event(1 + extra_event_dim),
            obs=u,
            infer={"is_observed": is_observed},
        )

        if value is None:
            g = -jnp.log(-jnp.log(clamp_probs(u)))  # standard Gumbel
            value = jax.nn.softmax((fn.logits + g) / fn.temperature, axis=-1)

        new_fn = Delta(value, event_dim=extra_event_dim + 1).mask(False)
        return {"fn": new_fn, "value": value, "is_observed": True}
