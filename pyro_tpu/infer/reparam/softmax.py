"""Gumbel-softmax reparam of Categorical sites (ref
``pyro/infer/reparam/softmax.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import primitives as pyro
from ...distributions.continuous import Gumbel
from ...distributions.delta import Delta
from ...distributions.discrete import Categorical
from .reparam import Reparam


class GumbelSoftmaxReparam(Reparam):
    """Categorical(z) = argmax(logits + Gumbel noise): the noise is the
    auxiliary latent; the value is the (hard) argmax."""

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        assert isinstance(fn, Categorical)
        if is_observed:
            return msg
        logits = fn.logits
        g = pyro.sample(
            f"{name}_uniform",
            Gumbel(jnp.zeros(logits.shape), 1.0).to_event(1),
        )
        z = jnp.argmax(logits + g, axis=-1)
        new_fn = Delta(z, event_dim=0)
        return {"fn": new_fn, "value": z, "is_observed": True}
