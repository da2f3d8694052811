"""ScoreParts: the surrogate-gradient decomposition of a log-prob.

Ref ``pyro/distributions/score_parts.py:11``: ``log_prob`` is the plain
density; ``score_function`` is the REINFORCE term (log_prob with the value
treated as constant — nonzero only for non-reparameterized sites); and
``entropy_term`` is the part differentiated pathwise (log_prob of an
rsample for reparameterized sites, zero otherwise).
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Any

from .util import scale_and_mask, is_identically_zero


class ScoreParts(NamedTuple):
    log_prob: Any
    score_function: Any
    entropy_term: Any

    def scale_and_mask(self, scale=1.0, mask=None) -> "ScoreParts":
        """Scale and mask all three components.

        Note (ref ``score_parts.py:27-46``): the score function is
        deliberately NOT scaled — subsampling scale appears once in the
        downstream cost, not twice.
        """
        log_prob = scale_and_mask(self.log_prob, scale, mask)
        score_function = self.score_function  # deliberately unscaled
        if mask is not None and not is_identically_zero(self.score_function):
            import jax.numpy as jnp

            score_function = jnp.where(mask, self.score_function, 0.0)
        entropy_term = scale_and_mask(self.entropy_term, scale, mask)
        return ScoreParts(log_prob, score_function, entropy_term)
