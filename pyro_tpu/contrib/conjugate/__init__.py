"""Collapsed conjugate-pair inference (ref ``pyro/contrib/conjugate``)."""

from .infer import BetaBinomialPair, GammaPoissonPair, collapse_conjugate, posterior_replay

__all__ = [
    "BetaBinomialPair",
    "GammaPoissonPair",
    "collapse_conjugate",
    "posterior_replay",
]
