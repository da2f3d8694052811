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
                    elbo_p = elbo_p + site["log_prob_sum"]
            for name, site in guide_trace.nodes.items():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    log_prob, score_function, entropy_term = site[
                        "score_parts"
                    ]
                    elbo_p = elbo_p - site["log_prob_sum"]
                    if not is_identically_zero(score_function):
                        surrogate_p = surrogate_p + site["log_prob_sum"]
            elbo_particles.append(elbo_p)
            surrogate_particles.append(surrogate_p)

        elbo_particles = jnp.stack(elbo_particles)
        log_weights = (1.0 - self.alpha) * elbo_particles
        log_mean_weight = logsumexp(log_weights, axis=0) - jnp.log(
            float(self.num_particles)
        )
        elbo = log_mean_weight / (1.0 - self.alpha)

        # reparameterized gradient flows through elbo_particles; score
        # function terms weighted by normalized importance weights
        weights = jax.nn.softmax(jax.lax.stop_gradient(log_weights))
        if surrogate_particles and not all(
            isinstance(s, float) and s == 0.0 for s in surrogate_particles
        ):
            surrogate_particles = jnp.stack(surrogate_particles)
            score_term = jnp.sum(
                weights
                * (
                    jax.lax.stop_gradient(elbo_particles)
                    * surrogate_particles
                )
            )
        else:
            score_term = 0.0
        surrogate = elbo + score_term
        return -(surrogate + jax.lax.stop_gradient(elbo - surrogate))

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs) -> float:
        return float(
            jax.device_get(
                self.differentiable_loss(
                    model, guide, *args, rng_key=rng_key, **kwargs
                )
            )
        )
