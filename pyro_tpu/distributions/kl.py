"""Analytic KL divergences (ref ``torch.distributions.kl`` +
``pyro/distributions/kl.py``), used by TraceMeanField_ELBO."""

from __future__ import annotations

import math
from typing import Callable, Dict, Tuple, Type

import jax.numpy as jnp
from jax.scipy import special as jsp

from .continuous import Beta, Exponential, Gamma, LogNormal, Normal, Uniform
from .delta import Delta
from .discrete import Bernoulli, Categorical, Geometric, Poisson
from .distribution import Distribution, Independent, MaskedDistribution
from .multivariate import Dirichlet, MultivariateNormal
from .util import sum_rightmost

_KL_REGISTRY: Dict[Tuple[Type, Type], Callable] = {}


def register_kl(type_p, type_q):
    def decorator(fn):
        _KL_REGISTRY[(type_p, type_q)] = fn
        return fn

    return decorator


def kl_divergence(p: Distribution, q: Distribution):
    # most-specific match by MRO distance (torch.distributions.kl
    # semantics); registration order must not matter
    best = None
    best_score = None
    for (tp, tq), fn in _KL_REGISTRY.items():
        if isinstance(p, tp) and isinstance(q, tq):
            score = type(p).__mro__.index(tp) + type(q).__mro__.index(tq)
            if best is None or score < best_score:
                best, best_score = fn, score
    if best is None:
        raise NotImplementedError(
            f"no KL({type(p).__name__} || {type(q).__name__}) registered"
        )
    return best(p, q)


def _register_masked_kl():
    # deferred: MaskedDistribution lives in distribution.py which imports
    # this module's registry machinery
    from .distribution import MaskedDistribution
    from .util import scale_and_mask

    @register_kl(MaskedDistribution, MaskedDistribution)
    def _kl_masked_masked(p, q):
        """Ref ``torch_distribution.py:529``: KL under the AND of both
        masks; fully-masked-out pairs contribute exactly 0."""
        if p._mask is False or q._mask is False:
            mask = False
        elif p._mask is True:
            mask = q._mask
        elif q._mask is True:
            mask = p._mask
        elif p._mask is q._mask:
            mask = p._mask
        else:
            mask = p._mask & q._mask
        if mask is False:
            return 0.0
        if mask is True:
            return kl_divergence(p.base_dist, q.base_dist)
        kl = kl_divergence(p.base_dist, q.base_dist)
        return scale_and_mask(kl, mask=mask)


@register_kl(Independent, Independent)
def _kl_independent(p, q):
    shared = min(p.reinterpreted_batch_ndims, q.reinterpreted_batch_ndims)
    if p.reinterpreted_batch_ndims != q.reinterpreted_batch_ndims:
        raise NotImplementedError
    kl = kl_divergence(p.base_dist, q.base_dist)
    return sum_rightmost(kl, shared)


@register_kl(Normal, Normal)
def _kl_normal_normal(p, q):
    var_ratio = (p.scale / q.scale) ** 2
    t1 = ((p.loc - q.loc) / q.scale) ** 2
    return 0.5 * (var_ratio + t1 - 1 - jnp.log(var_ratio))


@register_kl(Bernoulli, Bernoulli)
def _kl_bernoulli(p, q):
    import jax

    t1 = p.probs * (
        jax.nn.softplus(-q.logits) - jax.nn.softplus(-p.logits)
    )
    t2 = (1 - p.probs) * (
        jax.nn.softplus(q.logits) - jax.nn.softplus(p.logits)
    )
    return t1 + t2


@register_kl(Categorical, Categorical)
def _kl_categorical(p, q):
    t = p.probs * (p.logits - q.logits)
    return jnp.sum(jnp.where(p.probs == 0, 0.0, t), axis=-1)


@register_kl(Gamma, Gamma)
def _kl_gamma(p, q):
    t1 = q.concentration * (jnp.log(p.rate) - jnp.log(q.rate))
    t2 = jsp.gammaln(q.concentration) - jsp.gammaln(p.concentration)
    t3 = (p.concentration - q.concentration) * jsp.digamma(p.concentration)
    t4 = (q.rate - p.rate) * (p.concentration / p.rate)
    return t1 + t2 + t3 + t4


@register_kl(Beta, Beta)
def _kl_beta(p, q):
    sum_p = p.concentration1 + p.concentration0
    sum_q = q.concentration1 + q.concentration0
    t1 = (
        jsp.gammaln(sum_p)
        - jsp.gammaln(p.concentration1)
        - jsp.gammaln(p.concentration0)
    )
    t2 = (
        -jsp.gammaln(sum_q)
        + jsp.gammaln(q.concentration1)
        + jsp.gammaln(q.concentration0)
    )
    t3 = (p.concentration1 - q.concentration1) * jsp.digamma(p.concentration1)
    t4 = (p.concentration0 - q.concentration0) * jsp.digamma(p.concentration0)
    t5 = -(sum_p - sum_q) * jsp.digamma(sum_p)
    return t1 + t2 + t3 + t4 + t5


@register_kl(Dirichlet, Dirichlet)
def _kl_dirichlet(p, q):
    sum_p = jnp.sum(p.concentration, axis=-1)
    t1 = jsp.gammaln(sum_p) - jsp.gammaln(jnp.sum(q.concentration, axis=-1))
    t2 = jnp.sum(
        jsp.gammaln(q.concentration) - jsp.gammaln(p.concentration), axis=-1
    )
    t3 = jnp.sum(
        (p.concentration - q.concentration)
        * (jsp.digamma(p.concentration) - jsp.digamma(sum_p)[..., None]),
        axis=-1,
    )
    return t1 + t2 + t3


@register_kl(MultivariateNormal, MultivariateNormal)
def _kl_mvn(p, q):
    import jax

    n = p.event_shape[0]
    p_L, q_L = p.scale_tril, q.scale_tril
    half_logdet = jnp.sum(
        jnp.log(jnp.diagonal(q_L, axis1=-2, axis2=-1)), axis=-1
    ) - jnp.sum(jnp.log(jnp.diagonal(p_L, axis1=-2, axis2=-1)), axis=-1)
    # tr(Sigma_q^-1 Sigma_p) = || q_L^-1 p_L ||_F^2
    M = jax.scipy.linalg.solve_triangular(
        jnp.broadcast_to(q_L, p_L.shape), p_L, lower=True
    )
    tr = jnp.sum(M**2, axis=(-2, -1))
    diff = q.loc - p.loc
    y = jax.scipy.linalg.solve_triangular(
        q_L, diff[..., None], lower=True
    )[..., 0]
    mah = jnp.sum(y**2, axis=-1)
    return half_logdet + 0.5 * (tr + mah - n)


@register_kl(Exponential, Exponential)
def _kl_exponential(p, q):
    # KL(Exp(a) || Exp(b)) = log a - log b + b/a - 1
    ratio = q.rate / p.rate
    return jnp.log(p.rate) - jnp.log(q.rate) + ratio - 1.0


@register_kl(Poisson, Poisson)
def _kl_poisson(p, q):
    return (
        p.rate * (jnp.log(p.rate) - jnp.log(q.rate))
        - p.rate
        + q.rate
    )


@register_kl(Uniform, Uniform)
def _kl_uniform(p, q):
    # infinite when p's support is not within q's
    result = jnp.log(q.high - q.low) - jnp.log(p.high - p.low)
    return jnp.where(
        (q.low <= p.low) & (p.high <= q.high), result, jnp.inf
    )


@register_kl(LogNormal, LogNormal)
def _kl_lognormal(p, q):
    # invariant under the shared exp bijection: equals the base Normal KL
    var_ratio = (p.scale / q.scale) ** 2
    t1 = ((p.loc - q.loc) / q.scale) ** 2
    return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))


@register_kl(Geometric, Geometric)
def _kl_geometric(p, q):
    # E_p[x] = (1-p)/p ; KL = -H_p - E_p[ x log(1-q) + log q ]
    mean = (1.0 - p.probs) / p.probs
    return (
        mean * (jnp.log1p(-p.probs) - jnp.log1p(-q.probs))
        + jnp.log(p.probs)
        - jnp.log(q.probs)
    )


@register_kl(Delta, Distribution)
def _kl_delta(p, q):
    return -q.log_prob(p.v) + p.log_density


@register_kl(Distribution, Distribution)
def _kl_fallback(p, q):
    raise NotImplementedError(
        f"no KL({type(p).__name__} || {type(q).__name__}) registered"
    )


_register_masked_kl()
