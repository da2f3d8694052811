"""Additional distributions: OrderedLogistic, relaxed straight-through,
VonMises3D, SineSkewed, SineBivariateVonMises, MultivariateStudentT,
Stable, Empirical, FoldedDistribution, AffineBeta,
LogNormalNegativeBinomial.

Ref the correspondingly-named files under ``pyro/distributions/``.
"""

from __future__ import annotations

import math
import weakref

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from . import constraints
from .continuous import Beta, Gamma, Normal
from .delta import Delta
from .discrete import Categorical
from .distribution import Distribution, TransformedDistribution
from .transforms import AbsTransform, AffineTransform, SigmoidTransform
from .util import broadcast_shape, clamp_probs, promote_shapes


class OrderedLogistic(Categorical):
    """Ordinal regression likelihood (ref
    ``pyro/distributions/ordered_logistic.py``)."""

    arg_constraints = {
        "predictor": constraints.real,
        "cutpoints": constraints.ordered_vector,
    }

    def __init__(self, predictor, cutpoints):
        predictor = jnp.asarray(predictor, jnp.result_type(predictor, jnp.float32))
        cutpoints = jnp.asarray(cutpoints, jnp.result_type(cutpoints, jnp.float32))
        self.predictor = predictor
        self.cutpoints = cutpoints
        # P(Y <= k) = sigmoid(c_k - predictor)
        q = jax.nn.sigmoid(cutpoints - predictor[..., None])
        ones = jnp.ones(q.shape[:-1] + (1,), q.dtype)
        zeros = jnp.zeros(q.shape[:-1] + (1,), q.dtype)
        cdf = jnp.concatenate([zeros, q, ones], axis=-1)
        probs = clamp_probs(cdf[..., 1:] - cdf[..., :-1])
        super().__init__(probs=probs)
        self._pyro_init_args = ((predictor, cutpoints), ())

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return OrderedLogistic(
            jnp.broadcast_to(self.predictor, batch_shape),
            jnp.broadcast_to(
                self.cutpoints,
                batch_shape + self.cutpoints.shape[-1:],
            ),
        )


class RelaxedBernoulli(Distribution):
    """Concrete / Gumbel-sigmoid relaxation (torch.RelaxedBernoulli)."""

    arg_constraints = {
        "temperature": constraints.positive,
        "probs": constraints.unit_interval,
        "logits": constraints.real,
    }
    support = constraints.unit_interval
    has_rsample = True

    def __init__(self, temperature, probs=None, logits=None):
        from .util import logits_to_probs, probs_to_logits

        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs or logits")
        self.temperature = jnp.asarray(temperature)
        if probs is not None:
            self.probs = jnp.asarray(probs, jnp.result_type(probs, jnp.float32))
            self.logits = probs_to_logits(self.probs, is_binary=True)
        else:
            self.logits = jnp.asarray(logits, jnp.result_type(logits, jnp.float32))
            self.probs = logits_to_probs(self.logits, is_binary=True)
        super().__init__(jnp.shape(self.logits))

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        u = clamp_probs(jax.random.uniform(key, shape))
        gumbel_diff = jnp.log(u) - jnp.log1p(-u)
        return jax.nn.sigmoid(
            (self.logits + gumbel_diff) / self.temperature
        )

    def log_prob(self, value):
        t = self.temperature
        value = clamp_probs(value)
        y = jnp.log(value) - jnp.log1p(-value)
        diff = self.logits - t * y
        return (
            jnp.log(t)
            + diff
            - 2 * jax.nn.softplus(diff)
            - jnp.log(value * (1 - value))
        )

    def expand(self, batch_shape, _instance=None):
        # type(self) so the StraightThrough subclass survives expand
        return type(self)(
            self.temperature,
            logits=jnp.broadcast_to(self.logits, tuple(batch_shape)),
        )


class _UnquantizeRegistry:
    """Value-attached soft-sample registry for straight-through dists.

    The reference smuggles the soft (unquantized) sample through a
    tensor attribute (``relaxed_straight_through.py:45-58``:
    ``hard_value._unquantize = soft_value`` read back via ``getattr``
    in ``log_prob``), so that *any* distribution instance — a fresh
    model-side instance scoring a guide-drawn value, an unpickled
    copy — scores the soft sample.  JAX arrays cannot carry
    attributes, so the association travels through a module-level
    registry keyed by the hard array's object identity, with a
    ``weakref.finalize`` on the hard array evicting the entry (works
    for both concrete ``jax.Array``\\s and tracers, so it is jit-safe
    and never leaks tracers past their trace's lifetime).  Identity
    keying matches the reference's fidelity: a value that has been
    copied or recomputed loses its attribute there too and is scored
    directly.
    """

    def __init__(self):
        self._table = {}

    def attach(self, hard, soft):
        key = id(hard)
        self._table[key] = soft
        weakref.finalize(hard, self._table.pop, key, None)
        return hard

    def lookup(self, value):
        return self._table.get(id(value), value)


_UNQUANTIZE = _UnquantizeRegistry()


class RelaxedBernoulliStraightThrough(RelaxedBernoulli):
    """Hard samples, relaxed gradients
    (ref ``pyro/distributions/relaxed_straight_through.py``).

    ``rsample`` returns the quantized (hard 0/1) sample; ``log_prob``
    of that array — from *any* instance, matching the reference's
    value-attached ``_unquantize`` attribute — scores the soft sample
    it was quantized from (see :class:`_UnquantizeRegistry`).
    """

    def rsample(self, key, sample_shape=()):
        soft = clamp_probs(super().rsample(key, sample_shape))
        hard = jnp.round(soft)
        out = soft + jax.lax.stop_gradient(hard - soft)
        return _UNQUANTIZE.attach(out, soft)

    def log_prob(self, value):
        return super().log_prob(_UNQUANTIZE.lookup(value))


class RelaxedOneHotCategorical(Distribution):
    """Gumbel-softmax relaxation (torch.RelaxedOneHotCategorical)."""

    arg_constraints = {
        "temperature": constraints.positive,
        "probs": constraints.simplex,
        "logits": constraints.real_vector,
    }
    support = constraints.simplex
    has_rsample = True

    def __init__(self, temperature, probs=None, logits=None):
        self._categorical = Categorical(probs=probs, logits=logits)
        self.temperature = jnp.asarray(temperature)
        super().__init__(
            self._categorical.batch_shape,
            (self._categorical._num_events,),
        )

    @property
    def logits(self):
        return self._categorical.logits

    @property
    def probs(self):
        return self._categorical.probs

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        g = jax.random.gumbel(key, shape)
        return jax.nn.softmax(
            (self.logits + g) / self.temperature, axis=-1
        )

    def log_prob(self, value):
        k = self.event_shape[0]
        t = self.temperature
        logits = self.logits
        log_value = jnp.log(clamp_probs(value))
        score = logits - t * log_value
        score = score - jsp.logsumexp(score, axis=-1, keepdims=True)
        log_scale = jsp.gammaln(jnp.asarray(float(k))) + (k - 1) * jnp.log(
            t
        )
        return (
            jnp.sum(score - log_value, axis=-1) + log_scale
        )

    def expand(self, batch_shape, _instance=None):
        k = self.event_shape[0]
        return type(self)(
            self.temperature,
            logits=jnp.broadcast_to(
                self.logits, tuple(batch_shape) + (k,)
            ),
        )


class RelaxedOneHotCategoricalStraightThrough(RelaxedOneHotCategorical):
    """Ref ``relaxed_straight_through.py``; ``log_prob`` scores the
    unquantized sample via the identity cache (see
    :class:`RelaxedBernoulliStraightThrough`)."""

    def rsample(self, key, sample_shape=()):
        soft = clamp_probs(super().rsample(key, sample_shape))
        hard = jax.nn.one_hot(
            jnp.argmax(soft, -1), soft.shape[-1], dtype=soft.dtype
        )
        out = soft + jax.lax.stop_gradient(hard - soft)
        return _UNQUANTIZE.attach(out, soft)

    def log_prob(self, value):
        return super().log_prob(_UNQUANTIZE.lookup(value))


class VonMises3D(Distribution):
    """Von Mises-Fisher on S^2 (ref ``pyro/distributions/von_mises_3d.py``)."""

    arg_constraints = {"concentration": constraints.real_vector}
    support = constraints.sphere

    def __init__(self, concentration):
        self.concentration = jnp.asarray(
            concentration, jnp.result_type(concentration, jnp.float32)
        )
        if self.concentration.shape[-1] != 3:
            raise ValueError("VonMises3D requires 3-vector concentration")
        super().__init__(
            self.concentration.shape[:-1], self.concentration.shape[-1:]
        )

    def log_prob(self, value):
        scale = jnp.linalg.norm(self.concentration, axis=-1)
        lp = jnp.sum(self.concentration * value, axis=-1)
        return lp + jnp.log(
            scale / (4 * math.pi * jnp.sinh(scale))
        )

    def sample(self, key, sample_shape=()):
        """Wood (1994) rejection-free inverse-CDF sampler for vMF on S^2."""
        shape = tuple(sample_shape) + self.batch_shape
        kappa = jnp.linalg.norm(self.concentration, axis=-1)
        mu = self.concentration / jnp.clip(kappa[..., None], 1e-12)
        k1, k2 = jax.random.split(key)
        u = jax.random.uniform(k1, shape)
        # w in [-1, 1] with density ~ exp(kappa w)
        w = 1.0 + jnp.log(
            u + (1.0 - u) * jnp.exp(-2.0 * kappa)
        ) / jnp.clip(kappa, 1e-12)
        angle = jax.random.uniform(k2, shape, maxval=2 * math.pi)
        s = jnp.sqrt(jnp.clip(1 - w**2, 0.0))
        # orthonormal frame around mu
        e1, e2 = _orthonormal_frame(mu)
        x = (
            w[..., None] * mu
            + s[..., None]
            * (jnp.cos(angle)[..., None] * e1 + jnp.sin(angle)[..., None] * e2)
        )
        return x

    def expand(self, batch_shape, _instance=None):
        return VonMises3D(
            jnp.broadcast_to(
                self.concentration, tuple(batch_shape) + (3,)
            )
        )


def _orthonormal_frame(mu):
    # pick a helper axis least aligned with mu
    ref = jnp.where(
        jnp.abs(mu[..., :1]) < 0.9,
        jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), mu.shape),
        jnp.broadcast_to(jnp.array([0.0, 1.0, 0.0]), mu.shape),
    )
    e1 = jnp.cross(mu, ref)
    e1 = e1 / jnp.linalg.norm(e1, axis=-1, keepdims=True)
    e2 = jnp.cross(mu, e1)
    return e1, e2


class SineSkewed(Distribution):
    """Sine-skewing of a toroidal base distribution
    (ref ``pyro/distributions/sine_skewed.py``)."""

    arg_constraints = {"skewness": constraints.independent(constraints.interval(-1.0, 1.0), 1)}

    def __init__(self, base_dist: Distribution, skewness):
        self.base_dist = base_dist
        self.skewness = jnp.asarray(skewness)
        batch_shape = broadcast_shape(
            base_dist.batch_shape, self.skewness.shape[:-1]
        )
        super().__init__(batch_shape, base_dist.event_shape)

    @property
    def support(self):  # type: ignore[override]
        return self.base_dist.support

    def sample(self, key, sample_shape=()):
        # sine-skewing is relative to the base's (circular) mean: keep y
        # w.p. 0.5 + 0.5 sum_i skew_i sin(y_i - m_i), else reflect about
        # m (ref ``sine_skewed.py:sample``)
        k1, k2 = jax.random.split(key)
        ys = self.base_dist.sample(k1, sample_shape)
        m = self.base_dist.mean
        u = jax.random.uniform(k2, self.shape(sample_shape)[: -1] if self.event_shape else self.shape(sample_shape))
        mask = u < 0.5 + 0.5 * jnp.sum(
            self.skewness * jnp.sin(ys - m), axis=-1
        )
        return jnp.where(mask[..., None], ys, 2 * m - ys)

    def log_prob(self, value):
        base_lp = self.base_dist.log_prob(value)
        sk = jnp.sum(
            self.skewness * jnp.sin(value - self.base_dist.mean), axis=-1
        )
        return base_lp + jnp.log1p(sk)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return SineSkewed(
            self.base_dist.expand(batch_shape),
            jnp.broadcast_to(
                self.skewness, batch_shape + self.skewness.shape[-1:]
            ),
        )


class SineBivariateVonMises(Distribution):
    """Bivariate von Mises on the torus (sine variant; ref
    ``pyro/distributions/sine_bivariate_von_mises.py``; Singh et al. 2002)."""

    arg_constraints = {
        "phi_loc": constraints.real,
        "psi_loc": constraints.real,
        "phi_concentration": constraints.positive,
        "psi_concentration": constraints.positive,
        "correlation": constraints.real,
    }
    support = constraints.independent(
        constraints.interval(-math.pi, math.pi), 1
    )

    def __init__(
        self,
        phi_loc,
        psi_loc,
        phi_concentration,
        psi_concentration,
        correlation=None,
        weighted_correlation=None,
    ):
        if (correlation is None) == (weighted_correlation is None):
            raise ValueError(
                "pass exactly one of correlation or weighted_correlation"
            )
        (
            self.phi_loc,
            self.psi_loc,
            self.phi_concentration,
            self.psi_concentration,
        ) = promote_shapes(
            jnp.asarray(phi_loc, jnp.result_type(phi_loc, jnp.float32)),
            jnp.asarray(psi_loc, jnp.result_type(psi_loc, jnp.float32)),
            jnp.asarray(phi_concentration, jnp.result_type(phi_concentration, jnp.float32)),
            jnp.asarray(psi_concentration, jnp.result_type(psi_concentration, jnp.float32)),
        )
        if weighted_correlation is not None:
            correlation = weighted_correlation * jnp.sqrt(
                self.phi_concentration * self.psi_concentration
            )
        self.correlation = jnp.broadcast_to(
            jnp.asarray(correlation), self.phi_loc.shape
        )
        batch_shape = self.phi_loc.shape
        super().__init__(batch_shape, (2,))

    def _log_normalizer(self):
        """Series expansion of the normalizer (ref sine_bivariate docstring):
        C = 4 pi^2 sum_m C(2m,m) (rho^2/(4 k1 k2))^m I_m(k1) I_m(k2)."""
        k1 = self.phi_concentration
        k2 = self.psi_concentration
        rho = self.correlation
        m = jnp.arange(20)
        # log term_m = log C(2m, m) + m log(rho^2/(4 k1 k2)) + log I_m(k1) + log I_m(k2)
        log_binom = jsp.gammaln(2 * m + 1) - 2 * jsp.gammaln(m + 1)
        log_rho_term = m * jnp.log(
            jnp.clip(rho[..., None] ** 2 / (4 * k1[..., None] * k2[..., None]), 1e-37)
        )
        log_iv1 = _log_iv(m, k1)
        log_iv2 = _log_iv(m, k2)
        terms = log_binom + log_rho_term + log_iv1 + log_iv2
        return jnp.log(jnp.asarray(4 * math.pi**2)) + jsp.logsumexp(
            terms, axis=-1
        )

    def log_prob(self, value):
        phi, psi = value[..., 0], value[..., 1]
        k1, k2 = self.phi_concentration, self.psi_concentration
        rho = self.correlation
        un = (
            k1 * jnp.cos(phi - self.phi_loc)
            + k2 * jnp.cos(psi - self.psi_loc)
            + rho
            * jnp.sin(phi - self.phi_loc)
            * jnp.sin(psi - self.psi_loc)
        )
        return un - self._log_normalizer()

    def sample(self, key, sample_shape=(), max_tries=128):
        """Exact sampler (ref ``sine_bivariate_von_mises.py:sample``):
        draw phi from its exact marginal
        ``p(phi) ∝ exp(k1 cos(phi-mu)) I_0(alpha(phi))`` by rejection
        against a ``VonMises(mu, k1)`` envelope with constant bound
        ``I_0(sqrt(k2^2 + rho^2))`` (I_0 is increasing and
        ``alpha(phi) <= sqrt(k2^2 + rho^2)``), then psi | phi exactly —
        the conditional is ``VonMises(nu + beta, alpha)``."""
        from .continuous import VonMises

        k2c = self.psi_concentration
        rho = self.correlation
        shape = tuple(sample_shape) + self.batch_shape
        log_i0_max = _log_i0(jnp.sqrt(k2c**2 + rho**2))
        envelope = VonMises(self.phi_loc, self.phi_concentration)

        def alpha_of(phi):
            return jnp.sqrt(
                k2c**2 + (rho * jnp.sin(phi - self.phi_loc)) ** 2
            )

        def body(carry):
            k, phi, accepted, tries = carry
            k, kp, ku = jax.random.split(k, 3)
            prop = envelope.sample(kp, sample_shape)
            u = jax.random.uniform(ku, shape)
            accept = u < jnp.exp(_log_i0(alpha_of(prop)) - log_i0_max)
            phi = jnp.where(accepted, phi, prop)
            return k, phi, accepted | accept, tries + 1

        def cond(carry):
            return (~jnp.all(carry[2])) & (carry[3] < max_tries)

        key, kp0, ku0, kpsi = jax.random.split(key, 4)
        phi0 = envelope.sample(kp0, sample_shape)
        acc0 = jax.random.uniform(ku0, shape) < jnp.exp(
            _log_i0(alpha_of(phi0)) - log_i0_max
        )
        _, phi, _, _ = jax.lax.while_loop(
            cond, body, (key, phi0, acc0, 0)
        )
        beta = jnp.arctan2(
            rho * jnp.sin(phi - self.phi_loc), k2c
        )
        psi = VonMises(self.psi_loc + beta, alpha_of(phi)).sample(kpsi)
        return jnp.stack([phi, psi], axis=-1)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return SineBivariateVonMises(
            jnp.broadcast_to(self.phi_loc, batch_shape),
            jnp.broadcast_to(self.psi_loc, batch_shape),
            jnp.broadcast_to(self.phi_concentration, batch_shape),
            jnp.broadcast_to(self.psi_concentration, batch_shape),
            correlation=jnp.broadcast_to(self.correlation, batch_shape),
        )

    @property
    def norm_const(self):
        """Log normalization constant (ref
        ``sine_bivariate_von_mises.py:129-145``)."""
        return self._log_normalizer()


def _log_i0(z):
    """log I_0(z), stable for large z via the exponentially-scaled i0e."""
    z = jnp.asarray(z, jnp.result_type(z, jnp.float32))
    return jnp.log(jax.scipy.special.i0e(z)) + jnp.abs(z)


def _log_iv(m, z):
    """log I_m(z) for integer orders via the scipy.ive-style recursion.

    Uses the uniform asymptotic/series hybrid: for small orders relative to
    z, iterate the recurrence downward from I_{m}(z) computed by series.
    """
    # series: I_m(z) = sum_k (z/2)^{2k+m} / (k! (k+m)!)
    k = jnp.arange(30)
    log_half_z = jnp.log(jnp.clip(z / 2, 1e-37))
    terms = (
        (2 * k[:, None] + m[None, :]) * log_half_z[..., None, None]
        - jsp.gammaln(k[:, None] + 1)
        - jsp.gammaln(k[:, None] + m[None, :] + 1)
    )
    return jsp.logsumexp(terms, axis=-2)


class MultivariateStudentT(Distribution):
    """Ref ``pyro/distributions/multivariate_studentt.py``."""

    arg_constraints = {
        "df": constraints.positive,
        "loc": constraints.real_vector,
        "scale_tril": constraints.lower_cholesky,
    }
    support = constraints.real_vector
    has_rsample = True

    def __init__(self, df, loc, scale_tril):
        self.df = jnp.asarray(df, jnp.result_type(df, jnp.float32))
        loc = jnp.asarray(loc)
        scale_tril = jnp.asarray(scale_tril)
        batch_shape = broadcast_shape(
            jnp.shape(self.df), loc.shape[:-1], scale_tril.shape[:-2]
        )
        event_shape = loc.shape[-1:]
        self.loc = jnp.broadcast_to(loc, batch_shape + event_shape)
        self.scale_tril = jnp.broadcast_to(
            scale_tril, batch_shape + event_shape * 2
        )
        self.df = jnp.broadcast_to(self.df, batch_shape)
        super().__init__(batch_shape, event_shape)

    def rsample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = self.shape(sample_shape)
        z = jax.random.normal(k1, shape)
        g = jax.random.gamma(
            k2, self.df / 2, tuple(sample_shape) + self.batch_shape
        ) * (2 / self.df)
        y = jnp.einsum("...ij,...j->...i", self.scale_tril, z)
        return self.loc + y * jax.lax.rsqrt(g)[..., None]

    def log_prob(self, value):
        p = self.event_shape[0]
        diff = value - self.loc
        from jax.scipy.linalg import solve_triangular

        batch = broadcast_shape(self.batch_shape, diff.shape[:-1])
        L = jnp.broadcast_to(self.scale_tril, batch + (p, p))
        d = jnp.broadcast_to(diff, batch + (p,))
        y = solve_triangular(L, d[..., None], lower=True)[..., 0]
        M = jnp.sum(y**2, axis=-1)
        half_logdet = jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
        )
        df = self.df
        return (
            jsp.gammaln(0.5 * (df + p))
            - jsp.gammaln(0.5 * df)
            - 0.5 * p * jnp.log(df * math.pi)
            - half_logdet
            - 0.5 * (df + p) * jnp.log1p(M / df)
        )

    @property
    def mean(self):
        return jnp.where(
            self.df[..., None] > 1, self.loc, jnp.nan
        )

    @property
    def variance(self):
        v = jnp.sum(self.scale_tril**2, axis=-1)
        factor = self.df / (self.df - 2)
        return jnp.where(
            self.df[..., None] > 2, v * factor[..., None], jnp.inf
        )

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        p = self.event_shape[0]
        return MultivariateStudentT(
            jnp.broadcast_to(self.df, batch_shape),
            jnp.broadcast_to(self.loc, batch_shape + (p,)),
            jnp.broadcast_to(self.scale_tril, batch_shape + (p, p)),
        )

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @property
    def covariance_matrix(self):
        """df/(df-2) * L L^T; inf-scaled for df <= 2 (torch parity)."""
        L = self.scale_tril
        factor = self.df / (self.df - 2)
        return factor[..., None, None] * (L @ jnp.swapaxes(L, -1, -2))

    @property
    def precision_matrix(self):
        """Inverse of covariance_matrix (torch parity)."""
        L = self.scale_tril
        n = L.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        factor = (self.df - 2) / self.df
        return factor[..., None, None] * (
            jnp.swapaxes(Linv, -1, -2) @ Linv
        )


class Stable(Distribution):
    """alpha-stable distribution, S0 parameterization
    (ref ``pyro/distributions/stable.py``).

    Sampling via the reparameterized Chambers-Mallows-Stuck construction;
    ``log_prob`` is intractable — use
    ``pyro_tpu.infer.reparam.StableReparam`` (as the reference requires).
    """

    arg_constraints = {
        "stability": constraints.interval(0.0, 2.0),
        "skew": constraints.interval(-1.0, 1.0),
        "scale": constraints.positive,
        "loc": constraints.real,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, stability, skew, scale=1.0, loc=0.0, coords="S0"):
        assert coords in ("S", "S0")
        self.stability, self.skew, self.scale, self.loc = promote_shapes(
            jnp.asarray(stability, jnp.result_type(stability, jnp.float32)),
            jnp.asarray(skew, jnp.result_type(skew, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
        )
        self.coords = coords
        super().__init__(
            broadcast_shape(
                jnp.shape(stability),
                jnp.shape(skew),
                jnp.shape(scale),
                jnp.shape(loc),
            )
        )
        self._pyro_init_args = (
            (stability, skew, scale, loc),
            (("coords", coords),),
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        ku, ke = jax.random.split(key)
        half_pi = math.pi / 2
        u = jax.random.uniform(
            ku, shape, minval=1e-6, maxval=1 - 1e-6
        )
        V = (u - 0.5) * math.pi  # uniform(-pi/2, pi/2)
        W = jnp.clip(jax.random.exponential(ke, shape), 1e-20)
        a = self.stability
        b = self.skew
        B = jnp.arctan(b * jnp.tan(half_pi * a)) / a
        S = (1 + b**2 * jnp.tan(half_pi * a) ** 2) ** (1 / (2 * a))
        X = (
            S
            * jnp.sin(a * (V + B))
            / jnp.cos(V) ** (1 / a)
            * (jnp.cos(V - a * (V + B)) / W) ** ((1 - a) / a)
        )
        if self.coords == "S0":
            shift = -b * jnp.tan(half_pi * a)
            X = X + shift
        return self.loc + self.scale * X

    def log_prob(self, value):
        raise NotImplementedError(
            "Stable.log_prob is intractable; wrap the site in "
            "pyro_tpu.infer.reparam.StableReparam (ref stable.py docs)"
        )

    @property
    def mean(self):
        return jnp.where(
            self.stability > 1,
            self.loc
            - self.scale
            * self.skew
            * jnp.tan(math.pi * self.stability / 2)
            if self.coords == "S0"
            else self.loc,
            jnp.nan,
        )

    @property
    def variance(self):
        return jnp.where(
            self.stability == 2, 2 * self.scale**2, jnp.inf
        )

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        # type(self), not Stable: StableWithLogProb must survive expand
        return type(self)(
            jnp.broadcast_to(self.stability, batch_shape),
            jnp.broadcast_to(self.skew, batch_shape),
            jnp.broadcast_to(self.scale, batch_shape),
            jnp.broadcast_to(self.loc, batch_shape),
            coords=self.coords,
        )


class StableWithLogProb(Stable):
    """Stable distribution with a numerically-integrated ``log_prob``
    (ref ``pyro/distributions/stable.py:StableWithLogProb`` +
    ``stable_log_prob.py``); Gauss-Legendre quadrature of Nolan's
    integral, jittable and differentiable."""

    def log_prob(self, value):
        from .stable_log_prob import stable_log_prob

        z = (value - self.loc) / self.scale
        return stable_log_prob(
            self.stability, self.skew, z, coords=self.coords
        ) - jnp.log(self.scale)


class Empirical(Distribution):
    """Weighted empirical distribution (ref
    ``pyro/distributions/empirical.py:176``)."""

    arg_constraints = {}

    def __init__(self, samples, log_weights):
        self.samples = jnp.asarray(samples)
        self.log_weights = jnp.asarray(log_weights)
        agg = self.log_weights.ndim
        self._aggregation_dim = agg - 1
        event_shape = self.samples.shape[agg:]
        super().__init__(self.log_weights.shape[:-1], event_shape)

    @property
    def sample_size(self) -> int:
        return self.log_weights.shape[-1]

    def sample(self, key, sample_shape=()):
        logits = self.log_weights
        idx = jax.random.categorical(
            key, logits, axis=-1, shape=tuple(sample_shape) + self.batch_shape
        )
        if not self.batch_shape:
            return jnp.take(
                self.samples, idx, axis=self._aggregation_dim
            )
        # batched: samples is batch + (n,) + event and idx is
        # sample_shape + batch; gather one atom per batch element along
        # the aggregation dim, then drop that dim
        ev = len(self.event_shape)
        agg_axis = -1 - ev
        extra = idx.ndim - len(self.batch_shape)  # rank of sample_shape
        src = jnp.broadcast_to(
            self.samples, idx.shape[:extra] + self.samples.shape
        )
        idx_exp = idx.reshape(idx.shape + (1,) * (1 + ev))
        out = jnp.take_along_axis(
            src, idx_exp.astype(jnp.int32), axis=agg_axis
        )
        return jnp.squeeze(out, axis=agg_axis)

    def log_prob(self, value):
        """Log mass exactly at atoms (ref ``empirical.py:log_prob``);
        like the reference, vectorized scoring over extra leading dims
        is ambiguous and raises."""
        if jnp.ndim(value) > len(self.batch_shape) + len(self.event_shape):
            raise ValueError(
                "``value`` must have at most batch_shape + event_shape dims"
            )
        eq = self.samples == jnp.expand_dims(
            value, self._aggregation_dim
        )
        for _ in self.event_shape:
            eq = eq.all(axis=-1)
        lw = self.log_weights - jsp.logsumexp(
            self.log_weights, axis=-1, keepdims=True
        )
        return jsp.logsumexp(
            jnp.where(eq, lw, -jnp.inf), axis=-1
        )

    @property
    def mean(self):
        w = jax.nn.softmax(self.log_weights, axis=-1)
        w = w.reshape(w.shape + (1,) * len(self.event_shape))
        return jnp.sum(w * self.samples, axis=self._aggregation_dim)

    @property
    def variance(self):
        w = jax.nn.softmax(self.log_weights, axis=-1)
        w = w.reshape(w.shape + (1,) * len(self.event_shape))
        mean = jnp.expand_dims(self.mean, self._aggregation_dim)
        return jnp.sum(
            w * (self.samples - mean) ** 2, axis=self._aggregation_dim
        )


class FoldedDistribution(TransformedDistribution):
    """|X| for a real-valued X (ref ``pyro/distributions/folded.py``)."""

    support = constraints.positive

    def __init__(self, base_dist):
        if base_dist.event_shape:
            raise ValueError(
                "FoldedDistribution requires a univariate base"
            )
        super().__init__(base_dist, AbsTransform())
        self._pyro_init_args = ((base_dist,), ())

    def log_prob(self, value):
        dim = max(len(self.batch_shape), jnp.ndim(value))
        plus_minus = jnp.array([1.0, -1.0]).reshape(
            (2,) + (1,) * dim
        )
        lp = self.base_dist.log_prob(plus_minus * value)
        return jsp.logsumexp(lp, axis=0)

    def expand(self, batch_shape, _instance=None):
        return FoldedDistribution(
            self.base_dist.expand(tuple(batch_shape))
        )


class AffineBeta(TransformedDistribution):
    """Beta scaled to [loc, loc+scale] (ref
    ``pyro/distributions/affine_beta.py``)."""

    arg_constraints = {
        "concentration1": constraints.positive,
        "concentration0": constraints.positive,
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    has_rsample = True

    def __init__(self, concentration1, concentration0, loc, scale):
        base = Beta(concentration1, concentration0)
        self.loc_, self.scale_ = promote_shapes(
            jnp.asarray(loc, jnp.result_type(loc, jnp.float32)),
            jnp.asarray(scale, jnp.result_type(scale, jnp.float32)),
        )
        super().__init__(
            base, AffineTransform(self.loc_, self.scale_)
        )
        self._pyro_init_args = (
            (concentration1, concentration0, loc, scale),
            (),
        )

    @property
    def support(self):  # type: ignore[override]
        return constraints.interval(
            self.loc_, self.loc_ + self.scale_
        )

    @property
    def concentration1(self):
        return self.base_dist.concentration1

    @property
    def concentration0(self):
        return self.base_dist.concentration0

    @property
    def mean(self):
        return self.loc_ + self.scale_ * self.base_dist.mean

    @property
    def variance(self):
        return self.scale_**2 * self.base_dist.variance

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return AffineBeta(
            jnp.broadcast_to(self.concentration1, batch_shape),
            jnp.broadcast_to(self.concentration0, batch_shape),
            jnp.broadcast_to(self.loc_, batch_shape),
            jnp.broadcast_to(self.scale_, batch_shape),
        )

    @property
    def concentration1(self):
        return self.base_dist.concentration1

    @property
    def concentration0(self):
        return self.base_dist.concentration0

    @property
    def loc(self):
        return self.loc_

    @property
    def scale(self):
        return self.scale_

    @property
    def low(self):
        return self.loc_

    @property
    def high(self):
        return self.loc_ + self.scale_

    @property
    def sample_size(self):
        return self.concentration1 + self.concentration0


class LogNormalNegativeBinomial(Distribution):
    """NB with LogNormal-mixed rate, via Gauss-Hermite quadrature
    (ref ``pyro/distributions/log_normal_negative_binomial.py``)."""

    arg_constraints = {
        "total_count": constraints.positive,
        "logits": constraints.real,
        "multiplicative_noise_scale": constraints.positive,
    }
    support = constraints.nonnegative_integer
    is_discrete = True

    def __init__(
        self, total_count, logits, multiplicative_noise_scale, *, num_quad_points=8
    ):
        from ..ops.special import get_quad_rule

        self.total_count, self.logits, self.multiplicative_noise_scale = (
            promote_shapes(
                jnp.asarray(total_count, jnp.result_type(total_count, jnp.float32)),
                jnp.asarray(logits, jnp.result_type(logits, jnp.float32)),
                jnp.asarray(multiplicative_noise_scale, jnp.result_type(multiplicative_noise_scale, jnp.float32)),
            )
        )
        self.num_quad_points = num_quad_points
        self.quad_points, self.log_weights = get_quad_rule(num_quad_points)
        batch_shape = broadcast_shape(
            jnp.shape(total_count),
            jnp.shape(logits),
            jnp.shape(multiplicative_noise_scale),
        )
        super().__init__(batch_shape)
        self._pyro_init_args = (
            (total_count, logits, multiplicative_noise_scale),
            (("num_quad_points", num_quad_points),),
        )

    def log_prob(self, value):
        from .discrete import NegativeBinomial

        pad = max(jnp.ndim(value), len(self.batch_shape))
        eps = self.quad_points.reshape((-1,) + (1,) * pad)
        logits = (
            self.logits
            + eps * self.multiplicative_noise_scale
        )
        nb = NegativeBinomial(self.total_count, logits=logits)
        lp = nb.log_prob(value)
        lw = self.log_weights.reshape((-1,) + (1,) * pad)
        return jsp.logsumexp(lp + lw, axis=0)

    def sample(self, key, sample_shape=()):
        from .discrete import NegativeBinomial

        k1, k2 = jax.random.split(key)
        shape = self.shape(sample_shape)
        noise = (
            jax.random.normal(k1, shape)
            * self.multiplicative_noise_scale
        )
        return NegativeBinomial(
            jnp.broadcast_to(self.total_count, shape),
            logits=self.logits + noise,
        ).sample(k2)

    @property
    def mean(self):
        nb_mean = self.total_count * jnp.exp(self.logits)
        return nb_mean * jnp.exp(
            self.multiplicative_noise_scale**2 / 2
        )

    @property
    def variance(self):
        # ref log_normal_negative_binomial.py:147: overdispersion kappa
        kappa = (
            jnp.exp(self.multiplicative_noise_scale**2)
            * (1 + 1 / self.total_count)
            - 1
        )
        return self.mean + kappa * self.mean**2

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return LogNormalNegativeBinomial(
            jnp.broadcast_to(self.total_count, batch_shape),
            jnp.broadcast_to(self.logits, batch_shape),
            jnp.broadcast_to(
                self.multiplicative_noise_scale, batch_shape
            ),
            num_quad_points=self.num_quad_points,
        )
