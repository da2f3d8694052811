"""Reparameterizer base class (ref ``pyro/infer/reparam/reparam.py:25``)."""

from __future__ import annotations

from typing import Dict


class Reparam:
    """Transforms one sample site into auxiliary site(s) + deterministic
    reconstruction.  ``apply`` receives and returns a dict with keys
    (name, fn, value, is_observed)."""

    def apply(self, msg: Dict) -> Dict:
        raise NotImplementedError

    def __call__(self, name, fn, obs):
        # legacy interface (ref ``reparam.py:__call__``)
        new_msg = self.apply(
            {"name": name, "fn": fn, "value": obs, "is_observed": obs is not None}
        )
        return new_msg["fn"], new_msg["value"]
