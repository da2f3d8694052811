"""Rényi α-divergence ELBO (IWAE-style).

Ref ``pyro/infer/renyi_elbo.py:16`` (Li & Turner 2016; Burda et al. 2015
for alpha=0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from ..distributions.util import is_identically_zero
from .elbo import ELBO


class RenyiELBO(ELBO):
    def __init__(
        self,
        alpha: float = 0.0,
        num_particles: int = 2,
        max_plate_nesting: float = float("inf"),
        vectorize_particles: bool = True,
        strict_enumeration_warning: bool = True,
    ):
        if alpha == 1:
            raise ValueError(
                "alpha=1 is the standard ELBO; use Trace_ELBO"
            )
        self.alpha = alpha
        super().__init__(
            num_particles=num_particles,
            max_plate_nesting=max_plate_nesting,
            vectorize_particles=False,  # need per-particle log weights
            strict_enumeration_warning=strict_enumeration_warning,
        )
        self._vectorized = vectorize_particles

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        """Surrogate whose gradient is the Rényi bound gradient
        (ref ``renyi_elbo.py:106``)."""
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        keys = (
            jax.random.split(rng_key, self.num_particles)
            if self.num_particles > 1
            else [rng_key]
        )
        elbo_particles = []
        surrogate_particles = []
        from .enum import get_importance_trace

        for key in keys:
            model_trace, guide_trace = get_importance_trace(
                "flat", self.max_plate_nesting, model, guide, args, kwargs,
                rng_key=key,
            )
            elbo_p = 0.0
            surrogate_p = 0.0
            for name, site in model_trace.nodes.items():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    lps = site["log_prob_sum"]
                    elbo_p = elbo_p + jax.lax.stop_gradient(lps)
                    surrogate_p = surrogate_p + lps
            for name, site in guide_trace.nodes.items():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    log_prob, score_function, entropy_term = site[
                        "score_parts"
                    ]
                    lps = site["log_prob_sum"]
                    elbo_p = elbo_p - jax.lax.stop_gradient(lps)
                    if not is_identically_zero(entropy_term):
                        # reparameterized: pathwise -log q
                        surrogate_p = surrogate_p - lps
                        if not is_identically_zero(score_function):
                            # ref renyi_elbo.py:175 (pyro issue #1222)
                            raise NotImplementedError(
                                "RenyiELBO does not support mixed "
                                "reparameterized + score-function sites"
                            )
                    elif not is_identically_zero(score_function):
                        # score-function: +alpha/(1-alpha) log q
                        # (ref renyi_elbo.py:178-183)
                        surrogate_p = surrogate_p + (
                            self.alpha / (1.0 - self.alpha)
                        ) * lps
            elbo_particles.append(elbo_p)
            surrogate_particles.append(surrogate_p)

        elbo_particles = jnp.stack(elbo_particles)
        surrogate_particles = jnp.stack(surrogate_particles)
        log_weights = (1.0 - self.alpha) * elbo_particles
        log_mean_weight = logsumexp(log_weights, axis=0) - jnp.log(
            float(self.num_particles)
        )
        elbo = log_mean_weight / (1.0 - self.alpha)

        # normalized importance weights (detached) weight each particle's
        # surrogate (ref renyi_elbo.py:225-229)
        normalized_weights = jnp.exp(
            jax.lax.stop_gradient(log_weights - log_mean_weight)
        )
        surrogate_elbo = jnp.sum(
            normalized_weights * surrogate_particles
        ) / float(self.num_particles)
        return -(
            surrogate_elbo + jax.lax.stop_gradient(elbo - surrogate_elbo)
        )

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs) -> float:
        return float(
            jax.device_get(
                self.differentiable_loss(
                    model, guide, *args, rng_key=rng_key, **kwargs
                )
            )
        )
