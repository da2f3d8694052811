"""Reparameterization handler (ref ``pyro/poutine/reparam_messenger.py:165``).

A ``Reparam`` object transforms one sample site into one or more auxiliary
sites plus a deterministic reconstruction; the messenger swaps the site's
(fn, value) accordingly.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

from .messenger import Messenger


class ReparamMessenger(Messenger):
    def __init__(self, config: Union[Dict, Callable]):
        super().__init__()
        self.config = config

    def _pyro_sample(self, msg) -> None:
        if msg["infer"].get("_do_not_trace"):
            return
        # auxiliary sites introduced by a Reparam must not themselves be
        # reparameterized (ref reparam_messenger.py: is_auxiliary guard) —
        # otherwise e.g. NeuTraReparam recurses on its own latent
        if msg["infer"].get("is_auxiliary"):
            return
        if isinstance(self.config, dict):
            reparam = self.config.get(msg["name"])
        else:
            reparam = self.config(msg)
        if reparam is None:
            return
        new_msg = reparam.apply(
            {
                "name": msg["name"],
                "fn": msg["fn"],
                "value": msg["value"],
                "is_observed": msg["is_observed"],
                "rng_key": msg["rng_key"],
            }
        )
        msg["fn"] = new_msg["fn"]
        msg["value"] = new_msg["value"]
        msg["is_observed"] = new_msg["is_observed"]
        if msg["value"] is not None:
            msg["done"] = True


def reparam(fn=None, config=None):
    """Dual-use handler (ref ``pyro.poutine.reparam``)."""
    msngr = ReparamMessenger(config=config or {})
    return msngr if fn is None else msngr(fn)
