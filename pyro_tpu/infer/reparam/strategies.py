"""Reparametrization strategies (ref
``pyro/infer/reparam/strategies.py:83,131``)."""

from __future__ import annotations

from typing import Optional

from ...distributions import constraints
from ...distributions.distribution import (
    Independent,
    TransformedDistribution,
)
from .loc_scale import LocScaleReparam
from .reparam import Reparam
from .transform import TransformReparam


class Strategy:
    """Callable config for the reparam handler."""

    def __init__(self):
        self.config = {}

    def configure(self, msg) -> Optional[Reparam]:
        raise NotImplementedError

    def __call__(self, msg):
        name = msg["name"]
        if name not in self.config:
            self.config[name] = self.configure(msg)
        return self.config[name]


class MinimalReparam(Strategy):
    """Only reparams required for stability (ref ``strategies.py:83``)."""

    def configure(self, msg):
        return _minimal_reparam(msg["fn"], msg["is_observed"])


def _minimal_reparam(fn, is_observed):
    # unwrap Independent
    while isinstance(fn, Independent):
        fn = fn.base_dist
    if isinstance(fn, TransformedDistribution) and not is_observed:
        return TransformReparam()
    return None


class AutoReparam(Strategy):
    """Aggressive default strategy (ref ``strategies.py:131``): transforms
    + loc-scale decentering with learned centeredness."""

    def __init__(self, *, centered=None):
        super().__init__()
        self.centered = centered

    def configure(self, msg):
        fn = msg["fn"]
        result = _minimal_reparam(fn, msg["is_observed"])
        if result is not None:
            return result
        if msg["is_observed"]:
            return None
        if "_decentered" in msg["name"]:
            return None  # avoid infinite recursion (ref strategies.py:192)
        inner = fn
        while isinstance(inner, Independent):
            inner = inner.base_dist
        from ...distributions import constraints

        if (
            hasattr(inner, "loc")
            and hasattr(inner, "scale")
            and type(inner.support) is type(constraints.real)
        ):
            return LocScaleReparam(centered=self.centered)
        return None
