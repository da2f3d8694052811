"""Epidemiology distribution helpers (ref
``pyro/contrib/epidemiology/distributions.py``).

The key mechanism is **relaxed mode** (ref ``set_relaxed_distributions:84``):
inside :func:`set_relaxed_distributions`, the count distributions returned
by :func:`binomial_dist` / :func:`beta_binomial_dist` / :func:`poisson_dist`
/ :func:`negative_binomial_dist` / :func:`infection_dist` become
moment-matched Normals with a variance floor — real-valued, reparameterized,
and smooth, which is what makes `CompartmentalModel.fit_svi`/`fit_mcmc`
tractable on continuous flows.
"""

from __future__ import annotations

from contextlib import contextmanager

import jax.numpy as jnp

import pyro_tpu.distributions as dist
from pyro_tpu.distributions.util import is_validation_enabled

_RELAX = False
_RELAX_MIN_VARIANCE = 0.1
_OVERDISPERSION = 0.0


@contextmanager
def set_approx_sample_thresh(thresh):
    """Temporarily lower Binomial sampling to its Normal approximation for
    huge counts (ref ``distributions.py:26``)."""
    assert thresh > 0
    old = getattr(dist.Binomial, "approx_sample_thresh", float("inf"))
    try:
        dist.Binomial.approx_sample_thresh = thresh
        yield
    finally:
        dist.Binomial.approx_sample_thresh = old


@contextmanager
def set_approx_log_prob_tol(tol):
    """API parity (ref :56); our Binomial log_prob is exact via lgamma so
    the tolerance is advisory."""
    assert tol >= 0
    old = getattr(dist.Binomial, "approx_log_prob_tol", 0.0)
    try:
        dist.Binomial.approx_log_prob_tol = tol
        yield
    finally:
        dist.Binomial.approx_log_prob_tol = old


@contextmanager
def set_relaxed_distributions(relaxed: bool = True):
    """Ref ``distributions.py:84``."""
    global _RELAX
    old = _RELAX
    try:
        _RELAX = relaxed
        yield
    finally:
        _RELAX = old


def _validate_overdispersion(overdispersion):
    if is_validation_enabled():
        od = jnp.asarray(overdispersion)
        if not bool(jnp.all(od >= 0)):
            raise ValueError("Expected overdispersion >= 0")
        if not bool(jnp.all(od < 2)):
            raise ValueError("Expected overdispersion < 2")


def _relaxed_binomial(total_count, probs):
    """Moment-matched Normal allowing real total_count (ref :102)."""
    total_count, probs = jnp.broadcast_arrays(
        jnp.asarray(total_count, jnp.result_type(float)),
        jnp.asarray(probs, jnp.result_type(float)),
    )
    mean = probs * total_count
    variance = total_count * probs * (1 - probs)
    scale = jnp.sqrt(jnp.clip(variance, _RELAX_MIN_VARIANCE))
    return dist.Normal(mean, scale)


def _relaxed_beta_binomial(concentration1, concentration0, total_count):
    """Moment-matched Normal for BetaBinomial (ref :117)."""
    concentration1, concentration0, total_count = jnp.broadcast_arrays(
        jnp.asarray(concentration1, jnp.result_type(float)),
        jnp.asarray(concentration0, jnp.result_type(float)),
        jnp.asarray(total_count, jnp.result_type(float)),
    )
    c = concentration1 + concentration0
    beta_mean = concentration1 / c
    beta_variance = concentration1 * concentration0 / (c * c * (c + 1))
    mean = beta_mean * total_count
    variance = beta_variance * total_count * (c + total_count)
    scale = jnp.sqrt(jnp.clip(variance, _RELAX_MIN_VARIANCE))
    return dist.Normal(mean, scale)


def binomial_dist(total_count, probs, *, overdispersion=0.0):
    """Binomial; BetaBinomial if overdispersed; moment-matched Normal in
    relaxed mode (ref ``distributions.py:137``)."""
    od = overdispersion if _nonzero(overdispersion) else _OVERDISPERSION
    _validate_overdispersion(od)
    if not _nonzero(od):
        if _RELAX:
            return _relaxed_binomial(total_count, probs)
        # Extended: out-of-support enumerated values get -inf
        # (ref distributions.py binomial_dist -> ExtendedBinomial)
        return dist.ExtendedBinomial(total_count, probs=probs)
    p = jnp.clip(probs, 1e-6, 1 - 1e-6)
    c = 1.0 / jnp.clip(jnp.asarray(od, jnp.result_type(float)), 1e-4) ** 2
    concentration1 = p * c
    concentration0 = (1 - p) * c
    if _RELAX:
        return _relaxed_beta_binomial(
            concentration1, concentration0, total_count
        )
    return dist.ExtendedBetaBinomial(
        concentration1, concentration0, total_count
    )


def beta_binomial_dist(
    concentration1, concentration0, total_count, *, overdispersion=0.0
):
    """Ref ``distributions.py:194``."""
    _validate_overdispersion(overdispersion)
    if _RELAX:
        return _relaxed_beta_binomial(
            concentration1, concentration0, total_count
        )
    return dist.BetaBinomial(concentration1, concentration0, total_count)


def poisson_dist(rate, *, overdispersion=0.0):
    """Poisson; GammaPoisson if overdispersed; moment-matched Normal in
    relaxed mode (ref ``distributions.py:230``)."""
    _validate_overdispersion(overdispersion)
    if _RELAX:
        rate = jnp.asarray(rate, jnp.result_type(float))
        var = rate * (
            1 + jnp.asarray(overdispersion) ** 2 * rate
        )
        return dist.Normal(
            rate, jnp.sqrt(jnp.clip(var, _RELAX_MIN_VARIANCE))
        )
    if not _nonzero(overdispersion):
        return dist.Poisson(rate)
    c = 1.0 / jnp.clip(jnp.asarray(overdispersion), 1e-4) ** 2
    return dist.GammaPoisson(c, c / jnp.asarray(rate))


def negative_binomial_dist(concentration, probs=None, *, logits=None, overdispersion=0.0):
    """Ref ``distributions.py:237``."""
    if _RELAX:
        if logits is None:
            logits = jnp.log(probs) - jnp.log1p(-probs)
        mean = jnp.asarray(concentration) * jnp.exp(logits)
        var = mean / jnp.clip(1 - jnp.exp(logits) / (1 + jnp.exp(logits)), 1e-6)
        return dist.Normal(
            mean, jnp.sqrt(jnp.clip(var, _RELAX_MIN_VARIANCE))
        )
    return dist.NegativeBinomial(concentration, probs=probs, logits=logits)


def _nonzero(x) -> bool:
    """True unless x is a LITERAL zero (ref ``distributions.py:21``
    ``_is_zero``): traced/array overdispersion always takes the
    overdispersed path, which is smooth as od -> 0."""
    import numbers

    if isinstance(x, numbers.Number):
        return x != 0
    return True


def infection_dist(
    *,
    individual_rate,
    num_infectious,
    num_susceptible,
    population,
    concentration=float("inf"),
    overdispersion=0.0,
):
    """Distribution over new infections in one step (ref
    ``distributions.py:246``):

    - ``concentration=inf``: Poisson-contact limit — Binomial(S, 1-exp(-R
      I/N)) (or its overdispersed / relaxed variants);
    - finite ``concentration k``: superspreading — each infectious
      individual infects NB-many others; across a finite susceptible pool
      this becomes BetaBinomial(k*I, k*I*(N/R - 1), S).
    """
    R = individual_rate
    I = num_infectious
    S = num_susceptible
    N = jnp.clip(jnp.asarray(population, jnp.result_type(float)), 1.0)

    combined_p = jnp.clip(
        jnp.asarray(R) * jnp.asarray(I) / N, 0.0, 0.999999
    )
    # literal-inf check only: a traced concentration (sampled k) always
    # takes the superspreading branch
    import numbers

    is_poisson_contact = (
        isinstance(concentration, numbers.Number)
        and concentration == float("inf")
    )
    if is_poisson_contact:
        prob = 1.0 - jnp.exp(-combined_p)
        return binomial_dist(S, prob, overdispersion=overdispersion)
    # finite-population superspreading (ref :306-320): BetaBinomial with
    # effective concentrations k*I and k*I*(N/(R*I_eff) - 1)
    k = jnp.asarray(concentration, jnp.result_type(float))
    I_safe = jnp.clip(jnp.asarray(I, jnp.result_type(float)), 1e-3)
    c1 = jnp.clip(k * I_safe, 1e-3)
    c0 = jnp.clip(
        k * I_safe * (N / jnp.clip(jnp.asarray(R) * I_safe, 1e-6) - 1.0),
        1e-3,
    )
    return beta_binomial_dist(
        c1, c0, S, overdispersion=overdispersion
    )
