"""Native conjugate collapse handler.

Ref ``pyro/poutine/collapse_messenger.py``: the reference defers sites
inside a ``collapse`` context to lazy funsor terms and contracts the
latents out at exit (requires the external funsor package).  This native
version implements the same *observable contract* (ref
``tests/infer/test_gradient.py:396-423``) without funsor, for recognized
conjugate prior -> observed-likelihood pairs:

    Beta      -> Bernoulli / Binomial / Geometric
    Gamma     -> Poisson / Exponential
    Dirichlet -> Categorical / Multinomial
    Normal    -> Normal (latent is the likelihood ``loc``)

Mechanics: a latent sampled inside the context draws a value from its
prior as usual, but its trace node's ``fn`` is swapped for a
:class:`_CollapsedSite` wrapper.  When a downstream *observed* sample
statement's distribution carries that exact value as its parameter
(object identity; eager value-equality as a fallback for constructors
that normalize, e.g. ``Categorical``), the pair is resolved: the exact
marginal log-probability of the observation — latent integrated out in
closed form via sufficient statistics, correct for latents *shared*
across batched observations — is deposited on the latent's wrapper, and
the observed site is hidden from enclosing handlers (``msg["stop"]``).
The resulting trace therefore contains the latent site scoring the
marginal and no observed site, exactly as the reference's
funsor-contracted trace does.

Latents whose value never reaches a recognized observed likelihood
simply score under their prior (the collapse is a no-op for them).
Chains of collapsed latents (latent -> latent -> obs) require symbolic
deferral and are not supported; use enumeration or
``contrib.conjugate.collapse_conjugate``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.special import betaln, gammaln

from ..distributions import (
    Bernoulli,
    Beta,
    Binomial,
    Categorical,
    Dirichlet,
    Exponential,
    Gamma,
    Geometric,
    Multinomial,
    Normal,
    Poisson,
)
from .messenger import Messenger

__all__ = ["CollapseMessenger"]


class _CollapsedSite:
    """Stands in for a collapsed latent's ``fn`` in the trace.

    Samples delegate to the prior (so model code downstream receives a
    concrete value); ``log_prob`` returns the accumulated marginal
    log-probability of all resolved downstream observations (constant in
    ``value``), or the prior's log_prob while unresolved.
    """

    def __init__(self, name: str, prior):
        self.name = name
        self.prior = prior
        self._marginals: List[Any] = []

    # -- distribution API used by the runtime/trace ------------------------
    def __call__(self, *args, rng_key=None, sample_shape=()):
        return self.prior(*args, rng_key=rng_key, sample_shape=sample_shape)

    def sample(self, key, sample_shape=()):
        return self.prior.sample(key, sample_shape)

    @property
    def batch_shape(self):
        return self.prior.batch_shape

    @property
    def event_shape(self):
        return self.prior.event_shape

    def log_prob(self, value, *args, **kwargs):
        if not self._marginals:
            return self.prior.log_prob(value, *args, **kwargs)
        total = self._marginals[0]
        for m in self._marginals[1:]:
            total = total + m
        return total

    def score_parts(self, value, *args, **kwargs):
        from ..distributions.score_parts import ScoreParts

        lp = self.log_prob(value, *args, **kwargs)
        # marginal is constant in the (discarded) latent draw: fully
        # reparameterization-free, no score-function term needed
        return ScoreParts(log_prob=lp, score_function=None, entropy_term=lp)


def _shared_axes(lat_shape: Tuple[int, ...], obs_shape: Tuple[int, ...]):
    """Axes of ``obs_shape`` over which a latent of batch shape
    ``lat_shape`` is broadcast-shared (right-aligned), i.e. the axes whose
    observations must be pooled into one sufficient statistic."""
    nd = len(obs_shape)
    lat = (1,) * (nd - len(lat_shape)) + tuple(lat_shape[-nd:] if nd else ())
    return tuple(
        i for i in range(nd) if lat[i] == 1 and obs_shape[i] != 1
    )


def _nobs(obs_shape, axes):
    n = 1
    for i in axes:
        n *= obs_shape[i]
    return float(n)


# -- closed-form marginals ---------------------------------------------------
# Each rule takes (prior, likelihood fn, observed value) and returns the
# joint marginal log-probability with the latent's batch shape.


def _beta_bernoulli(prior: Beta, fn: Bernoulli, x):
    a, b = prior.concentration1, prior.concentration0
    ax = _shared_axes(prior.batch_shape, jnp.shape(x))
    s1 = jnp.sum(x, axis=ax)
    s0 = jnp.sum(1.0 - x, axis=ax)
    return betaln(a + s1, b + s0) - betaln(a, b)


def _beta_binomial(prior: Beta, fn: Binomial, x):
    a, b = prior.concentration1, prior.concentration0
    n = jnp.broadcast_to(fn.total_count, jnp.shape(x)) if jnp.shape(x) else fn.total_count
    ax = _shared_axes(prior.batch_shape, jnp.shape(x))
    choose = (
        gammaln(n + 1.0) - gammaln(x + 1.0) - gammaln(n - x + 1.0)
    )
    return (
        jnp.sum(choose, axis=ax)
        + betaln(a + jnp.sum(x, axis=ax), b + jnp.sum(n - x, axis=ax))
        - betaln(a, b)
    )


def _beta_geometric(prior: Beta, fn: Geometric, x):
    # x failures before first success: p(x|p) = (1-p)^x p
    a, b = prior.concentration1, prior.concentration0
    ax = _shared_axes(prior.batch_shape, jnp.shape(x))
    n = _nobs(jnp.shape(x), ax)
    return betaln(a + n, b + jnp.sum(x, axis=ax)) - betaln(a, b)


def _gamma_poisson(prior: Gamma, fn: Poisson, x):
    a, b = prior.concentration, prior.rate
    ax = _shared_axes(prior.batch_shape, jnp.shape(x))
    n = _nobs(jnp.shape(x), ax)
    sx = jnp.sum(x, axis=ax)
    return (
        -jnp.sum(gammaln(x + 1.0), axis=ax)
        + a * jnp.log(b)
        - (a + sx) * jnp.log(b + n)
        + gammaln(a + sx)
        - gammaln(a)
    )


def _gamma_exponential(prior: Gamma, fn: Exponential, x):
    a, b = prior.concentration, prior.rate
    ax = _shared_axes(prior.batch_shape, jnp.shape(x))
    n = _nobs(jnp.shape(x), ax)
    return (
        gammaln(a + n)
        - gammaln(a)
        + a * jnp.log(b)
        - (a + n) * jnp.log(b + jnp.sum(x, axis=ax))
    )


def _dirichlet_counts_marginal(alpha, counts, count_axis=-1):
    a0 = jnp.sum(alpha, axis=count_axis)
    n = jnp.sum(counts, axis=count_axis)
    return (
        gammaln(a0)
        - gammaln(a0 + n)
        + jnp.sum(gammaln(alpha + counts) - gammaln(alpha), axis=count_axis)
    )


def _dirichlet_categorical(prior: Dirichlet, fn: Categorical, x):
    alpha = prior.concentration
    k = alpha.shape[-1]
    onehot = jax.nn.one_hot(jnp.asarray(x, jnp.int32), k)
    ax = _shared_axes(prior.batch_shape[:-1], jnp.shape(x))
    counts = jnp.sum(onehot, axis=ax) if ax else onehot
    return _dirichlet_counts_marginal(alpha, counts)


def _dirichlet_multinomial(prior: Dirichlet, fn: Multinomial, x):
    alpha = prior.concentration
    obs_batch = jnp.shape(x)[:-1]
    ax = _shared_axes(prior.batch_shape[:-1], obs_batch)
    n_i = jnp.sum(x, axis=-1)
    coeff = gammaln(n_i + 1.0) - jnp.sum(gammaln(x + 1.0), axis=-1)
    counts = jnp.sum(x, axis=ax) if ax else x
    return jnp.sum(coeff, axis=ax) + _dirichlet_counts_marginal(
        alpha, counts
    )


def _normal_normal(prior: Normal, fn: Normal, x):
    # x_i ~ Normal(z, s_i),  z ~ Normal(m, t):  z integrated out exactly
    m, t = prior.loc, prior.scale
    s = jnp.broadcast_to(fn.scale, jnp.shape(x)) if jnp.shape(x) else fn.scale
    ax = _shared_axes(prior.batch_shape, jnp.shape(x))
    prec = 1.0 / (s * s)
    post_prec = 1.0 / (t * t) + jnp.sum(prec, axis=ax)
    mu_p = m / (t * t) + jnp.sum(x * prec, axis=ax)
    n = _nobs(jnp.shape(x), ax)
    quad = (
        jnp.sum(x * x * prec, axis=ax)
        + (m * m) / (t * t)
        - (mu_p * mu_p) / post_prec
    )
    logdet = (
        jnp.sum(jnp.log(s * s), axis=ax)
        + jnp.log(t * t)
        + jnp.log(post_prec)
    )
    return -0.5 * (quad + logdet + n * jnp.log(2.0 * jnp.pi))


_RULES = [
    (Beta, Bernoulli, "probs", _beta_bernoulli),
    (Beta, Binomial, "probs", _beta_binomial),
    (Beta, Geometric, "probs", _beta_geometric),
    (Gamma, Poisson, "rate", _gamma_poisson),
    (Gamma, Exponential, "rate", _gamma_exponential),
    (Dirichlet, Categorical, "probs", _dirichlet_categorical),
    (Dirichlet, Multinomial, "probs", _dirichlet_multinomial),
    (Normal, Normal, "loc", _normal_normal),
]

_PRIOR_TYPES = tuple({rule[0] for rule in _RULES})


def _param_candidates(fn, _depth=0) -> List[Any]:
    """Array-valued attributes of ``fn``, recursing one level into nested
    distribution objects (e.g. ``Multinomial._categorical``)."""
    out = []
    for v in vars(fn).values():
        if isinstance(v, jax.Array) or isinstance(v, jnp.ndarray):
            out.append(v)
        elif _depth < 2 and hasattr(v, "log_prob") and hasattr(v, "__dict__"):
            out.extend(_param_candidates(v, _depth + 1))
    return out


def _same_array(a, b) -> bool:
    """True when ``a`` is ``b`` or (eagerly) a broadcast of ``b``.

    The eager value path covers constructors that re-create the parameter
    array: plate broadcasting (``fn.expand``), ``Categorical``'s prob
    normalization.  Traced values cannot be compared by value.
    """
    if a is b:
        return True
    if isinstance(a, jax.core.Tracer) or isinstance(b, jax.core.Tracer):
        return False
    try:
        b_cast = jnp.broadcast_to(b, jnp.shape(a))
    except (ValueError, TypeError):
        return False
    try:
        return bool(jnp.all(a == b_cast))
    except TypeError:  # pragma: no cover - non-comparable dtypes
        return False


class CollapseMessenger(Messenger):
    """``with poutine.collapse(): ...`` — see module docstring."""

    def __init__(self):
        super().__init__()
        # value-id -> _CollapsedSite wrapper
        self._tagged: Dict[int, _CollapsedSite] = {}
        # parallel list for the eager value-equality fallback
        self._tagged_values: List[Tuple[Any, _CollapsedSite]] = []

    def __enter__(self):
        self._tagged = {}
        self._tagged_values = []
        return super().__enter__()

    def _find_wrapper(self, fn) -> Optional[_CollapsedSite]:
        candidates = _param_candidates(fn)
        for cand in candidates:
            hit = self._tagged.get(id(cand))
            if hit is not None:
                return hit
            for val, wrapper in self._tagged_values:
                if _same_array(cand, val):
                    return wrapper
        # Tracing fallback: under jit/grad, `jnp.asarray` re-wraps tracers
        # so both identity and value matching are unavailable (the
        # reference solves this with funsor coercions inside constructors,
        # ``distribution.py:COERCIONS``).  If exactly ONE tagged latent's
        # prior family pairs with this likelihood type, resolve it; more
        # than one is ambiguous and raises.  This requires latents to flow
        # *unmodified* into the likelihood parameter — transforms of the
        # latent are not detectable and not supported under tracing.
        if not any(isinstance(c, jax.core.Tracer) for c in candidates):
            return None
        matches = []
        for _, wrapper in self._tagged_values:
            for prior_t, lik_t, _param, _rule in _RULES:
                if isinstance(wrapper.prior, prior_t) and type(fn) is lik_t:
                    if wrapper not in matches:
                        matches.append(wrapper)
        if len(matches) > 1:
            raise NotImplementedError(
                "poutine.collapse: cannot disambiguate which of "
                f"{[w.name for w in matches]} parameterizes this "
                f"{type(fn).__name__} under jit/grad tracing; collapse "
                "one conjugate latent per family per context, or run "
                "eagerly."
            )
        return matches[0] if matches else None

    def _pyro_sample(self, msg):
        fn = msg["fn"]
        if not msg["is_observed"]:
            if isinstance(fn, _PRIOR_TYPES):
                wrapper = _CollapsedSite(msg["name"], fn)
                msg["fn"] = wrapper
                msg["infer"] = dict(msg["infer"], collapse=True)
            return
        # observed site: resolve against a tagged latent if possible
        wrapper = self._find_wrapper(fn)
        if wrapper is None:
            return
        for prior_t, lik_t, _param, rule in _RULES:
            if isinstance(wrapper.prior, prior_t) and type(fn) is lik_t:
                value = jnp.asarray(msg["value"])
                wrapper._marginals.append(
                    rule(wrapper.prior, fn, value)
                )
                # hide the observed site from enclosing handlers: its
                # probability mass now lives on the latent's node
                msg["stop"] = True
                msg["done"] = True
                return

    def _postprocess_message(self, msg):
        fn = msg["fn"]
        if isinstance(fn, _CollapsedSite) and msg["value"] is not None:
            self._tagged[id(msg["value"])] = fn
            self._tagged_values.append((msg["value"], fn))
