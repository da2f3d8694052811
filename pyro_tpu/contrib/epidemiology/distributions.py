"""Epidemiology distribution helpers (ref
``pyro/contrib/epidemiology/distributions.py``)."""

from __future__ import annotations

import jax.numpy as jnp

import pyro_tpu.distributions as dist

_OVERDISPERSION = 0.0


def set_approx_sample_thresh(thresh):  # API parity hook
    dist.Binomial.approx_sample_thresh = thresh


def binomial_dist(total_count, probs, *, overdispersion: float = 0.0):
    """Binomial or (if overdispersed) moment-matched BetaBinomial
    (ref ``distributions.py:137``)."""
    od = overdispersion or _OVERDISPERSION
    if od == 0.0:
        return dist.Binomial(total_count, probs=probs)
    p = jnp.clip(probs, 1e-6, 1 - 1e-6)
    # concentration from the overdispersion parameterization (ref :170)
    c = 1.0 / (od**2)
    concentration1 = p * c
    concentration0 = (1 - p) * c
    return dist.BetaBinomial(concentration1, concentration0, total_count)


def beta_binomial_dist(concentration1, concentration0, total_count, *, overdispersion: float = 0.0):
    """Ref ``distributions.py:beta_binomial_dist``."""
    return dist.BetaBinomial(concentration1, concentration0, total_count)


def infection_dist(
    *,
    individual_rate,
    num_infectious,
    num_susceptible,
    population,
    concentration=float("inf"),
    overdispersion: float = 0.0,
):
    """Distribution over new infections in one step (ref
    ``distributions.py:246``):

    S2I ~ Binomial(S, 1 - exp(-R0 * I / population)) in the Poisson-contact
    limit (concentration=inf); negative-binomial contact otherwise.
    """
    combined_p = jnp.clip(
        individual_rate * num_infectious / jnp.clip(population, 1.0),
        0.0,
        0.999999,
    )
    if concentration == float("inf"):
        prob = 1.0 - jnp.exp(-combined_p)
        return binomial_dist(
            num_susceptible, prob, overdispersion=overdispersion
        )
    # superspreader (negative-binomial-contact) variant
    logits = jnp.log(
        jnp.clip(combined_p / concentration, 1e-10)
    )
    return dist.NegativeBinomial(
        jnp.clip(concentration * num_susceptible, 1e-3),
        logits=logits,
    )
