"""Extended-support distributions (ref ``pyro/distributions/extended.py``):
like their bases but return -inf log_prob outside the support instead of
erroring, as needed by epidemiology's relaxed value iteration."""

from __future__ import annotations

import jax.numpy as jnp

from . import constraints
from .conjugate import BetaBinomial
from .discrete import Binomial


class ExtendedBinomial(Binomial):
    support = constraints.integer_greater_than(-1 - 10**10)  # effectively Z

    def log_prob(self, value):
        inside = (value >= 0) & (value <= self.total_count) & (value % 1 == 0)
        safe = jnp.where(inside, value, 0.0)
        return jnp.where(inside, super().log_prob(safe), -jnp.inf)


class ExtendedBetaBinomial(BetaBinomial):
    support = constraints.integer_greater_than(-1 - 10**10)

    def log_prob(self, value):
        inside = (value >= 0) & (value <= self.total_count) & (value % 1 == 0)
        safe = jnp.where(inside, value, 0.0)
        return jnp.where(inside, super().log_prob(safe), -jnp.inf)
