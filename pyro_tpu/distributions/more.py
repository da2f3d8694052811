"""Catalog-completing distributions.

Covers the remaining names in the reference's
``pyro/distributions/__init__.py`` ``__all__``: ``ContinuousBernoulli``,
``FisherSnedecor``, ``LogisticNormal``, ``Wishart`` (torch wrappers,
ref ``torch.py``), ``LKJ``/``LKJCorrCholesky`` (ref ``lkj.py``),
``SkewLogistic`` (ref ``logistic.py:85``), ``SoftAsymmetricLaplace``
(ref ``asymmetriclaplace.py:85``), ``TruncatedPolyaGamma``
(ref ``polya_gamma.py:13``), ``GroupedNormalNormal``
(ref ``grouped_normal_normal.py:15``), ``NanMaskedNormal``/
``NanMaskedMultivariateNormal`` (ref ``nanmasked.py``),
``OneHotCategoricalStraightThrough`` (ref torch wrapper), ``Rejector``
(ref ``rejector.py:12``), ``MixtureOfDiagNormals`` (ref
``diag_normal_mixture.py``), ``MixtureOfDiagNormalsSharedCovariance``,
``GaussianScaleMixture`` (ref ``gaussian_scale_mixture.py``), and
``OMTMultivariateNormal``/``AVFMultivariateNormal`` (ref ``omt_mvn.py``/
``avf_mvn.py``).

TPU notes: the reference's custom torch ``autograd.Function`` gradient
estimators are implemented as ``jax.custom_vjp`` rules here — pathwise
mixture gradients in ``mixture_pathwise.py`` (so the mixtures advertise
``has_rsample = True``) and the OMT/AVF transport gradients in
``mvn_gradients.py``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import gammaln, logsumexp

from . import constraints
from .continuous import Exponential, Gamma, Normal, UnivariateMixin
from .discrete import Categorical, OneHotCategorical
from .distribution import Distribution, TransformedDistribution
from .multivariate import LKJCholesky, MultivariateNormal
from .transforms import StickBreakingTransform, Transform
from .util import broadcast_shape


def _bcast_all(*args):
    args = [jnp.asarray(a, jnp.result_type(float)) for a in args]
    shape = jnp.broadcast_shapes(*(a.shape for a in args))
    return tuple(jnp.broadcast_to(a, shape) for a in args)


class ContinuousBernoulli(UnivariateMixin, Distribution):
    """Continuous relaxation of Bernoulli on [0, 1] (torch wrapper parity,
    Loaiza-Ganem & Cunningham 2019)."""

    arg_constraints = {"probs": constraints.unit_interval}
    support = constraints.unit_interval
    has_rsample = True

    def __init__(self, probs=None, logits=None):
        if (probs is None) == (logits is None):
            raise ValueError("pass exactly one of probs / logits")
        if probs is None:
            probs = jax.nn.sigmoid(jnp.asarray(logits))
        self.probs = jnp.asarray(probs, jnp.result_type(float))
        super().__init__(jnp.shape(self.probs))

    def _log_norm(self):
        # C(p) = 2 atanh(1-2p) / (1-2p) for p != 1/2, else 2
        p = jnp.clip(self.probs, 1e-6, 1 - 1e-6)
        x = 1 - 2 * p
        safe = jnp.where(jnp.abs(x) < 1e-4, 1e-2, x)
        c = 2 * jnp.arctanh(safe) / safe
        # Taylor around p = 1/2: C = 2 + x^2*2/3 + ...
        c_taylor = 2.0 + x**2 * (2.0 / 3.0)
        return jnp.log(jnp.where(jnp.abs(x) < 1e-4, c_taylor, c))

    def log_prob(self, value):
        p = jnp.clip(self.probs, 1e-6, 1 - 1e-6)
        return (
            value * jnp.log(p)
            + (1 - value) * jnp.log1p(-p)
            + self._log_norm()
        )

    def cdf(self, value):
        p = jnp.clip(self.probs, 1e-6, 1 - 1e-6)
        x = jnp.clip(value, 0.0, 1.0)
        num = p**x * (1 - p) ** (1 - x) + p - 1
        den = 2 * p - 1
        safe_den = jnp.where(jnp.abs(den) < 1e-4, 1.0, den)
        return jnp.where(jnp.abs(den) < 1e-4, x, num / safe_den)

    def icdf(self, u):
        # F(x) = ((1-p) r^x + p - 1)/(2p-1) with r = p/(1-p), so
        # x = log1p(u (2p-1)/(1-p)) / log(r)
        p = jnp.clip(self.probs, 1e-6, 1 - 1e-6)
        den = jnp.log(p) - jnp.log1p(-p)
        safe_den = jnp.where(jnp.abs(den) < 1e-4, 1.0, den)
        x = jnp.log1p(u * (2 * p - 1) / (1 - p)) / safe_den
        return jnp.where(jnp.abs(den) < 1e-4, u, x)

    def rsample(self, key, sample_shape=()):
        u = jax.random.uniform(key, self.shape(sample_shape))
        return self.icdf(u)

    @property
    def mean(self):
        p = jnp.clip(self.probs, 1e-6, 1 - 1e-6)
        x = 1 - 2 * p
        safe = jnp.where(jnp.abs(x) < 1e-4, 1e-2, x)
        m = p / (2 * p - 1) + 1 / (2 * jnp.arctanh(1 - 2 * jnp.clip(p, 1e-6, 1 - 1e-6)))
        return jnp.where(jnp.abs(x) < 1e-4, 0.5, m)

    @property
    def logits(self):
        """Log-odds (torch parity)."""
        from .util import probs_to_logits

        return probs_to_logits(self.probs, is_binary=True)


class FisherSnedecor(UnivariateMixin, Distribution):
    """F-distribution (torch wrapper parity)."""

    arg_constraints = {
        "df1": constraints.positive,
        "df2": constraints.positive,
    }
    support = constraints.positive
    has_rsample = True

    def __init__(self, df1, df2):
        self.df1, self.df2 = _bcast_all(df1, df2)
        super().__init__(self.df1.shape)

    def rsample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        shape = self.shape(sample_shape)
        x1 = jax.random.gamma(k1, self.df1 / 2, shape) * 2
        x2 = jax.random.gamma(k2, self.df2 / 2, shape) * 2
        return (x1 / self.df1) / jnp.clip(
            x2 / self.df2, jnp.finfo(x2.dtype).tiny
        )

    def log_prob(self, value):
        d1, d2 = self.df1, self.df2
        h1, h2 = d1 / 2, d2 / 2
        return (
            h1 * jnp.log(d1)
            + h2 * jnp.log(d2)
            + (h1 - 1) * jnp.log(value)
            - (h1 + h2) * jnp.log(d2 + d1 * value)
            - (gammaln(h1) + gammaln(h2) - gammaln(h1 + h2))
        )

    @property
    def mean(self):
        return jnp.where(self.df2 > 2, self.df2 / (self.df2 - 2), jnp.nan)


class LogisticNormal(TransformedDistribution):
    """Softmax-transformed Normal on the simplex via stick-breaking
    (torch wrapper parity)."""

    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
    }
    support = constraints.simplex
    has_rsample = True

    def __init__(self, loc, scale):
        loc, scale = _bcast_all(loc, scale)
        self.loc, self.scale = loc, scale
        base = Normal(loc, scale).to_event(1)
        super().__init__(base, [StickBreakingTransform()])


class Wishart(Distribution):
    """Wishart distribution over positive-definite matrices (torch
    wrapper parity); sampling by Bartlett decomposition."""

    arg_constraints = {
        "df": constraints.positive,
        "scale_tril": constraints.lower_cholesky,
    }
    support = constraints.positive_definite
    has_rsample = True

    def __init__(self, df, covariance_matrix=None, scale_tril=None):
        if (covariance_matrix is None) == (scale_tril is None):
            raise ValueError("pass exactly one of covariance_matrix / scale_tril")
        if scale_tril is None:
            scale_tril = jnp.linalg.cholesky(jnp.asarray(covariance_matrix))
        self.scale_tril = jnp.asarray(scale_tril, jnp.result_type(float))
        p = self.scale_tril.shape[-1]
        self.df = jnp.asarray(df, self.scale_tril.dtype)
        batch_shape = broadcast_shape(
            jnp.shape(self.df), self.scale_tril.shape[:-2]
        )
        super().__init__(batch_shape, (p, p))

    @property
    def covariance_matrix(self):
        return self.scale_tril @ jnp.swapaxes(self.scale_tril, -1, -2)

    def rsample(self, key, sample_shape=()):
        p = self.event_shape[-1]
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        # Bartlett: A lower-triangular, diag A_ii^2 ~ chi2(df - i), off-diag N(0,1)
        i = jnp.arange(p)
        df = jnp.broadcast_to(self.df, shape)[..., None]
        chi2 = 2 * jax.random.gamma(k1, (df - i) / 2, shape + (p,))
        normal = jax.random.normal(k2, shape + (p, p))
        A = jnp.tril(normal, -1) + jnp.zeros(shape + (p, p)).at[
            ..., i, i
        ].set(jnp.sqrt(chi2))
        LA = self.scale_tril @ A
        return LA @ jnp.swapaxes(LA, -1, -2)

    def log_prob(self, value):
        p = self.event_shape[-1]
        df = self.df
        L = jnp.linalg.cholesky(value)
        half_logdet_V = jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1
        )
        half_logdet_S = jnp.sum(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)), -1
        )
        # tr(S^-1 V) = ||solve(L_S, L_V)||_F^2 via a triangular solve
        Ls, Lv = jnp.broadcast_arrays(self.scale_tril, L)
        X = jax.scipy.linalg.solve_triangular(Ls, Lv, lower=True)
        trace = jnp.sum(X**2, (-2, -1))
        i = jnp.arange(p)
        mvlgamma = p * (p - 1) / 4 * math.log(math.pi) + jnp.sum(
            gammaln(df[..., None] / 2 - i / 2), -1
        )
        return (
            (df - p - 1) * half_logdet_V
            - 0.5 * trace
            - df * p / 2 * math.log(2)
            - df * half_logdet_S
            - mvlgamma
        )

    @property
    def precision_matrix(self):
        """Inverse of covariance_matrix (torch parity)."""
        L = self.scale_tril
        n = L.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return jnp.swapaxes(Linv, -1, -2) @ Linv

    @property
    def mode(self):
        """Mode (torch parity): (df - p - 1) * Sigma for df > p + 1."""
        p = self.event_shape[-1]
        factor = jnp.clip(self.df - p - 1, 0, None)
        return factor[..., None, None] * self.covariance_matrix


class LKJ(TransformedDistribution):
    """LKJ prior over full correlation matrices: LKJCholesky pushed
    through L -> L @ L.T (ref ``lkj.py``)."""

    arg_constraints = {"concentration": constraints.positive}
    support = constraints.corr_matrix

    def __init__(self, dim, concentration=1.0):

        base = LKJCholesky(dim, concentration)
        self.dim = dim
        self.concentration = base.concentration
        super().__init__(base, [_CorrCholToMatrix()])


class _CorrCholToMatrix(Transform):
    # module-level (not defined inside LKJ.__init__) so LKJ pickles
    domain = constraints.corr_cholesky
    codomain = constraints.corr_matrix

    def __call__(self, x):
        return x @ jnp.swapaxes(x, -1, -2)

    def _inverse(self, y):
        return jnp.linalg.cholesky(y)

    def log_abs_det_jacobian(self, x, y):
        # inverse of CorrMatrixCholeskyTransform (ref
        # transforms/cholesky.py:64): |J| = prod L_ii^(n-1-i)
        n = x.shape[-1]
        order = jnp.arange(n - 1, -1, -1)
        return jnp.sum(
            order
            * jnp.log(
                jnp.clip(
                    jnp.diagonal(x, axis1=-2, axis2=-1),
                    jnp.finfo(x.dtype).tiny,
                )
            ),
            -1,
        )


class LKJCorrCholesky(LKJCholesky):
    """Deprecated alias (ref ``lkj.py:LKJCorrCholesky``): LKJCholesky with
    ``eta`` naming."""

    def __init__(self, d, eta):
        super().__init__(d, eta)


class SkewLogistic(UnivariateMixin, Distribution):
    """Skewed logistic, Type I generalized logistic (ref ``logistic.py:85``)."""

    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
        "asymmetry": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc, scale, asymmetry=1.0):
        self.loc, self.scale, self.asymmetry = _bcast_all(
            loc, scale, asymmetry
        )
        super().__init__(self.loc.shape)

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        a = self.asymmetry
        return (
            jnp.log(a)
            - z
            + jax.nn.log_sigmoid(z) * (a + 1)
            - jnp.log(self.scale)
        )

    def cdf(self, value):
        z = (value - self.loc) / self.scale
        return jax.nn.sigmoid(z) ** self.asymmetry

    def icdf(self, u):
        z = jax.scipy.special.logit(u ** (1 / self.asymmetry))
        return self.loc + self.scale * z

    def rsample(self, key, sample_shape=()):
        u = jax.random.uniform(
            key,
            self.shape(sample_shape),
            minval=jnp.finfo(jnp.float32).tiny,
            maxval=1.0,
        )
        return self.icdf(u)


class SoftAsymmetricLaplace(UnivariateMixin, Distribution):
    """Gaussian-smoothed asymmetric Laplace: z - u + v with
    z ~ Normal(loc, scale*softness), u ~ Exp(scale*asymmetry),
    v ~ Exp(scale/asymmetry) (ref ``asymmetriclaplace.py:85``)."""

    arg_constraints = {
        "loc": constraints.real,
        "scale": constraints.positive,
        "asymmetry": constraints.positive,
        "softness": constraints.positive,
    }
    support = constraints.real
    has_rsample = True

    def __init__(self, loc, scale, asymmetry=1.0, softness=1.0):
        self.loc, self.scale, self.asymmetry, self.softness = _bcast_all(
            loc, scale, asymmetry, softness
        )
        super().__init__(self.loc.shape)

    @property
    def left_scale(self):
        return self.scale * self.asymmetry

    @property
    def right_scale(self):
        return self.scale / self.asymmetry

    @property
    def soft_scale(self):
        return self.scale * self.softness

    def log_prob(self, value):
        x = (value - self.loc) / self.scale
        L = self.asymmetry
        R = 1 / self.asymmetry
        S = self.softness
        SS = S * S
        S2 = S * math.sqrt(2)
        Lx = L * x
        Rx = R * x

        def logerfc(t):
            # log(erfc(t)) stable for large t via asymptotic expansion
            small = jnp.log(
                jnp.clip(
                    jax.scipy.special.erfc(jnp.minimum(t, 9.0)),
                    jnp.finfo(t.dtype).tiny,
                )
            )
            big = (
                -(t**2)
                - jnp.log(jnp.clip(t, 1.0) * math.sqrt(math.pi))
                + jnp.log1p(-1 / (2 * jnp.clip(t, 1.0) ** 2))
            )
            return jnp.where(t > 9.0, big, small)

        return (
            math.log(0.5)
            + jnp.logaddexp(
                (SS / 2 + Lx) / L**2 + logerfc((SS + Lx) / (L * S2)),
                (SS / 2 - Rx) / R**2 + logerfc((SS - Rx) / (R * S2)),
            )
            - jnp.log(L + R)
            - jnp.log(self.scale)
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        kz, ku, kv = jax.random.split(key, 3)
        z = jax.random.normal(kz, shape)
        u = jax.random.exponential(ku, shape)
        v = jax.random.exponential(kv, shape)
        return (
            self.loc
            + self.soft_scale * z
            - self.left_scale * u
            + self.right_scale * v
        )

    @property
    def mean(self):
        total = self.left_scale + self.right_scale
        return self.loc + (self.right_scale**2 - self.left_scale**2) / total

    @property
    def variance(self):
        left, right = self.left_scale, self.right_scale
        total = left + right
        p, q = left / total, right / total
        return (
            p * left**2 + q * right**2 + p * q * total**2 + self.soft_scale**2
        )


class TruncatedPolyaGamma(Distribution):
    """PolyaGamma(1, 0) truncated to (0, 2.5) (ref ``polya_gamma.py:13``);
    log_prob by 7-term alternating series, approximate sampler by a
    truncated sum of exponentials."""

    truncation_point = 2.5
    num_log_prob_terms = 7
    num_gamma_variates = 8

    arg_constraints = {}
    support = constraints.interval(0.0, truncation_point)
    has_rsample = False

    def __init__(self, prototype=None, batch_shape=()):
        self.prototype = prototype
        super().__init__(tuple(batch_shape), ())

    def expand(self, batch_shape, _instance=None):
        return TruncatedPolyaGamma(self.prototype, tuple(batch_shape))

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        denom = jnp.arange(0.5, self.num_gamma_variates) ** 2
        x = jax.random.exponential(
            key, shape + (self.num_gamma_variates,)
        )
        x = jnp.sum(x / denom, -1)
        return jnp.clip(
            x * (0.5 / math.pi**2), None, self.truncation_point
        )

    def log_prob(self, value):
        v = value[..., None]
        two_n_plus_one = 2.0 * jnp.arange(self.num_log_prob_terms) + 1.0
        log_terms = (
            jnp.log(two_n_plus_one)
            - 1.5 * jnp.log(v)
            - 0.125 * two_n_plus_one**2 / v
        )
        even = jnp.exp(logsumexp(log_terms[..., ::2], axis=-1))
        odd = jnp.exp(logsumexp(log_terms[..., 1::2], axis=-1))
        return jnp.log(jnp.clip(even - odd, jnp.finfo(v.dtype).tiny)) - (
            0.5 * math.log(2.0 * math.pi)
        )


class GroupedNormalNormal(Distribution):
    """Normal observations with a latent per-group Normal mean integrated
    out analytically (ref ``grouped_normal_normal.py:15``).  Scatter-adds
    are one-hot einsums on TPU."""

    arg_constraints = {
        "prior_loc": constraints.real,
        "prior_scale": constraints.positive,
        "obs_scale": constraints.positive,
    }
    support = constraints.real

    def __init__(self, prior_loc, prior_scale, obs_scale, group_idx):
        prior_loc, prior_scale = _bcast_all(prior_loc, prior_scale)
        self.prior_loc = prior_loc
        self.prior_scale = prior_scale
        self.obs_scale = jnp.asarray(obs_scale, jnp.result_type(float))
        self.group_idx = jnp.asarray(group_idx, jnp.int32)
        self.num_groups = prior_loc.shape[0]
        self._onehot = jax.nn.one_hot(
            self.group_idx, self.num_groups, dtype=prior_loc.dtype
        )
        self.num_data_per_group = jnp.sum(self._onehot, 0)
        super().__init__((), ())

    def _scatter(self, x):
        return jnp.einsum("n,ng->g", x, self._onehot)

    def get_posterior(self, value):
        """Exact Normal posterior over the per-group latent means
        (ref :105)."""
        obs_prec = self.obs_scale**-2
        prior_prec = self.prior_scale**-2
        prec = prior_prec + self._scatter(
            jnp.broadcast_to(obs_prec, self.group_idx.shape)
        )
        loc = (
            self._scatter(value * obs_prec) + self.prior_loc * prior_prec
        ) / prec
        return Normal(loc, prec**-0.5)

    def log_prob(self, value):
        prior_scale_sq = self.prior_scale**2
        obs_prec = jnp.broadcast_to(
            self.obs_scale**-2, self.group_idx.shape
        )
        obs_prec_sum = self._scatter(obs_prec)
        scale_ratio = prior_scale_sq * obs_prec_sum
        delta = value - self.prior_loc[self.group_idx]
        scaled_delta = delta * obs_prec
        scaled_delta_sum = self._scatter(scaled_delta)

        result1 = -jnp.sum(
            self.num_data_per_group * (0.5 * math.log(2 * math.pi))
        )
        result2 = -0.5 * jnp.sum(jnp.log1p(scale_ratio)) - jnp.sum(
            jnp.broadcast_to(
                jnp.log(self.obs_scale), self.group_idx.shape
            )
        )
        result3 = -0.5 * jnp.dot(delta, scaled_delta)
        numerator = prior_scale_sq * scaled_delta_sum**2
        result4 = 0.5 * jnp.sum(numerator / (1.0 + scale_ratio))
        return result1 + result2 + result3 + result4


class NanMaskedNormal(Normal):
    """Normal whose log_prob skips NaN observations (ref ``nanmasked.py``)."""

    def log_prob(self, value):
        ok = ~jnp.isnan(value)
        safe = jnp.where(ok, value, 0.0)
        lp = super().log_prob(safe)
        return jnp.where(ok, lp, 0.0)


class NanMaskedMultivariateNormal(MultivariateNormal):
    """MVN whose log_prob marginalizes out NaN components per event
    (ref ``nanmasked.py``).  Uses a masked-precision solve: rows/cols of
    missing entries are replaced by identity so the Cholesky stays valid."""

    def log_prob(self, value):
        ok = ~jnp.isnan(value)
        safe = jnp.where(ok, value, 0.0)
        # Masked covariance: zero the cross terms of missing dims and set
        # their diagonal to 1, so they decouple as standard-normal factors
        # contributing exactly 0.5*log(2*pi) each — subtracted back below.
        cov = self.covariance_matrix
        n = cov.shape[-1]
        mask2 = ok[..., :, None] & ok[..., None, :]
        eye_mask = jnp.eye(n, dtype=bool)
        cov_masked = jnp.where(
            mask2, cov, jnp.where(eye_mask, 1.0, 0.0)
        )
        L = jnp.linalg.cholesky(cov_masked)
        diff = jnp.where(ok, safe - self.loc, 0.0)
        Lb = jnp.broadcast_to(L, diff.shape[:-1] + L.shape[-2:])
        y = jax.scipy.linalg.solve_triangular(
            Lb, diff[..., None], lower=True
        )[..., 0]
        maha = jnp.sum(y**2, -1)
        # missing dims have L_ii = 1 so their logdet contribution is 0
        half_logdet = jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1
        )
        k = jnp.sum(ok, -1)
        return -0.5 * (k * math.log(2 * math.pi) + maha) - half_logdet


class OneHotCategoricalStraightThrough(OneHotCategorical):
    """One-hot categorical with straight-through gradients: the sample is
    hard but gradients flow to ``probs`` (torch wrapper parity)."""

    has_rsample = True

    def rsample(self, key, sample_shape=()):
        hard = super().sample(key, sample_shape)
        probs = jax.nn.softmax(self.logits, axis=-1)
        return jax.lax.stop_gradient(hard - probs) + probs


class Rejector(Distribution):
    """Rejection-sampled distribution (ref ``rejector.py:12``): proposes
    from ``propose`` and accepts with prob ``exp(log_prob_accept(x))``;
    total acceptance ``exp(log_scale)`` must be provided for a normalized
    ``log_prob``."""

    has_rsample = True
    arg_constraints = {}

    def __init__(self, propose, log_prob_accept, log_scale):
        self.propose = propose
        self.log_prob_accept = log_prob_accept
        self._log_scale = jnp.asarray(log_scale, jnp.result_type(float))
        super().__init__(propose.batch_shape, propose.event_shape)

    def rsample(self, key, sample_shape=(), max_tries=64):
        shape = tuple(sample_shape) + self.batch_shape

        def body(carry):
            k, x, accepted, _ = carry
            k, k1, k2 = jax.random.split(k, 3)
            prop = self.propose.rsample(k1, sample_shape)
            u = jax.random.uniform(k2, shape)
            accept = u < jnp.exp(self.log_prob_accept(prop))
            x = jnp.where(
                jnp.reshape(
                    accepted, accepted.shape + (1,) * len(self.event_shape)
                ),
                x,
                prop,
            )
            return k, x, accepted | accept, carry[3] + 1

        def cond(carry):
            return (~jnp.all(carry[2])) & (carry[3] < max_tries)

        x0 = self.propose.rsample(key, sample_shape)
        acc0 = jax.random.uniform(
            jax.random.fold_in(key, 1), shape
        ) < jnp.exp(self.log_prob_accept(x0))
        _, x, _, _ = jax.lax.while_loop(
            cond, body, (jax.random.fold_in(key, 2), x0, acc0, 0)
        )
        return x

    def log_prob(self, value):
        return (
            self.propose.log_prob(value)
            + self.log_prob_accept(value)
            - self._log_scale
        )


class MixtureOfDiagNormals(Distribution):
    """Mixture of K diagonal-covariance Normals (ref
    ``diag_normal_mixture.py``).  ``rsample`` implements the pathwise
    derivative of Jankowiak & Karaletsos (arXiv:1806.01856) via a
    ``jax.custom_vjp`` port of the reference's autograd Function
    (``diag_normal_mixture.py:134-246``); see ``mixture_pathwise.py``."""

    arg_constraints = {
        "locs": constraints.real,
        "coord_scale": constraints.positive,
        "component_logits": constraints.real,
    }
    support = constraints.real_vector
    has_rsample = True

    def __init__(self, locs, coord_scale, component_logits):
        self.locs = jnp.asarray(locs, jnp.result_type(float))
        self.coord_scale = jnp.asarray(coord_scale, self.locs.dtype)
        self.component_logits = jnp.asarray(
            component_logits, self.locs.dtype
        )
        self.dim = self.locs.shape[-1]
        batch_shape = self.locs.shape[:-2]
        super().__init__(batch_shape, (self.dim,))

    def log_prob(self, value):
        eps = (value[..., None, :] - self.locs) / self.coord_scale
        comp_lp = jnp.sum(
            -0.5 * eps**2
            - 0.5 * math.log(2 * math.pi)
            - jnp.log(self.coord_scale),
            -1,
        )
        mix_lp = jax.nn.log_softmax(self.component_logits, axis=-1)
        return logsumexp(comp_lp + mix_lp, axis=-1)

    def rsample(self, key, sample_shape=()):
        from .mixture_pathwise import mix_diag_normal_sample

        k1, k2 = jax.random.split(key)
        which = Categorical(logits=self.component_logits).sample(
            k1, sample_shape
        )
        white = jax.random.normal(
            k2,
            tuple(sample_shape) + self.batch_shape + (self.dim,),
            self.locs.dtype,
        )
        pis = jax.nn.softmax(self.component_logits, axis=-1)
        return mix_diag_normal_sample(
            self.locs,
            self.coord_scale,
            self.component_logits,
            pis,
            which,
            white,
        )

    def sample(self, key, sample_shape=()):
        return jax.lax.stop_gradient(self.rsample(key, sample_shape))


class MixtureOfDiagNormalsSharedCovariance(Distribution):
    """Mixture of diagonal Normals sharing one coord_scale (ref
    ``diag_normal_mixture_shared_cov.py``) with the pathwise gradient
    estimator (``mixture_pathwise.py``)."""

    arg_constraints = {
        "locs": constraints.real,
        "coord_scale": constraints.positive,
        "component_logits": constraints.real,
    }
    support = constraints.real_vector
    has_rsample = True

    def __init__(self, locs, coord_scale, component_logits):
        self.locs = jnp.asarray(locs, jnp.result_type(float))
        self.coord_scale = jnp.asarray(coord_scale, self.locs.dtype)
        self.component_logits = jnp.asarray(
            component_logits, self.locs.dtype
        )
        self.dim = self.locs.shape[-1]
        batch_shape = self.locs.shape[:-2]
        super().__init__(batch_shape, (self.dim,))

    def log_prob(self, value):
        coord_scale = (
            self.coord_scale[..., None, :]
            if self.coord_scale.ndim > 1
            else self.coord_scale
        )
        eps = (value[..., None, :] - self.locs) / coord_scale
        comp_lp = (
            jax.nn.log_softmax(self.component_logits, axis=-1)
            + jnp.sum(-0.5 * eps**2, -1)
        )
        out = logsumexp(comp_lp, axis=-1)
        out = out - 0.5 * math.log(2 * math.pi) * self.dim
        out = out - jnp.sum(jnp.log(self.coord_scale), -1)
        return out

    def rsample(self, key, sample_shape=()):
        from .mixture_pathwise import mix_diag_normal_shared_cov_sample

        k1, k2 = jax.random.split(key)
        which = Categorical(logits=self.component_logits).sample(
            k1, sample_shape
        )
        white = jax.random.normal(
            k2,
            tuple(sample_shape) + self.batch_shape + (self.dim,),
            self.locs.dtype,
        )
        pis = jax.nn.softmax(self.component_logits, axis=-1)
        return mix_diag_normal_shared_cov_sample(
            self.locs,
            self.coord_scale,
            self.component_logits,
            pis,
            which,
            white,
        )

    def sample(self, key, sample_shape=()):
        return jax.lax.stop_gradient(self.rsample(key, sample_shape))


class GaussianScaleMixture(Distribution):
    """Zero-mean mixture of Gaussians differing by an isotropic scale
    factor (ref ``gaussian_scale_mixture.py``)."""

    arg_constraints = {
        "coord_scale": constraints.positive,
        "component_logits": constraints.real,
        "component_scale": constraints.positive,
    }
    support = constraints.real_vector
    has_rsample = True

    def __init__(self, coord_scale, component_logits, component_scale):
        self.coord_scale = jnp.asarray(coord_scale, jnp.result_type(float))
        self.component_logits = jnp.asarray(
            component_logits, self.coord_scale.dtype
        )
        self.component_scale = jnp.asarray(
            component_scale, self.coord_scale.dtype
        )
        self.dim = self.coord_scale.shape[-1]
        if self.dim < 2:
            raise NotImplementedError(
                "GaussianScaleMixture does not support D = 1"
            )
        super().__init__((), (self.dim,))

    def log_prob(self, value):
        eps = value / self.coord_scale
        scales = self.component_scale
        comp_lp = (
            -0.5 * jnp.sum(eps[..., None, :] ** 2, -1) / scales**2
            - self.dim * jnp.log(scales)
            - 0.5 * self.dim * math.log(2 * math.pi)
            - jnp.sum(jnp.log(self.coord_scale), -1)
        )
        mix_lp = jax.nn.log_softmax(self.component_logits, axis=-1)
        return logsumexp(comp_lp + mix_lp, axis=-1)

    def rsample(self, key, sample_shape=()):
        from .mixture_pathwise import gsm_sample

        k1, k2 = jax.random.split(key)
        which = Categorical(logits=self.component_logits).sample(
            k1, sample_shape
        )
        white = jax.random.normal(
            k2, tuple(sample_shape) + (self.dim,), self.coord_scale.dtype
        )
        pis = jax.nn.softmax(self.component_logits, axis=-1)
        return gsm_sample(
            self.coord_scale,
            self.component_logits,
            self.component_scale,
            pis,
            which,
            white,
        )

    def sample(self, key, sample_shape=()):
        return jax.lax.stop_gradient(self.rsample(key, sample_shape))


class OMTMultivariateNormal(MultivariateNormal):
    """MVN with optimal-mass-transport pathwise gradients w.r.t. both
    parameters (ref ``omt_mvn.py:13-40``; Jankowiak & Karaletsos,
    arXiv:1806.01856).  Same density as :class:`MultivariateNormal`;
    ``rsample`` routes through the O(D^3) OMT backward
    (``mvn_gradients.py``), which generally has lower gradient variance
    than the standard reparameterization trick.

    Like the reference (``omt_mvn.py:30-34``), ``scale_tril`` must be
    2-D — the estimator is defined for a single (unbatched) Cholesky
    factor.  ``loc`` may carry batch dims (``expand`` broadcasts it and
    keeps the shared factor); for a batch of *factors*, ``jax.vmap`` the
    underlying ``mvn_gradients.omt_mvn_sample`` directly — the custom
    VJP composes with vmap (tested in ``tests/test_omt_mvn.py``)."""

    def __init__(self, loc, scale_tril):
        loc = jnp.asarray(loc, jnp.result_type(float))
        scale_tril = jnp.asarray(scale_tril, loc.dtype)
        if loc.ndim < 1:
            raise ValueError(
                "OMTMultivariateNormal loc must be at least 1-dimensional"
            )
        if scale_tril.ndim != 2:
            raise ValueError(
                "OMTMultivariateNormal scale_tril must be 2-dimensional "
                "(a single factor; vmap mvn_gradients.omt_mvn_sample for "
                "batched factors)"
            )
        super().__init__(loc, scale_tril=scale_tril)

    def expand(self, batch_shape, _instance=None):
        # keep the single 2-D factor; only loc broadcasts (the custom VJP
        # unbroadcasts its gradient to the stored loc shape)
        n = self.event_shape[0]
        return type(self)(
            jnp.broadcast_to(self.loc, tuple(batch_shape) + (n,)),
            self._unbroadcast_scale_tril,
        )

    def rsample(self, key, sample_shape=()):
        from .mvn_gradients import omt_mvn_sample

        white = jax.random.normal(
            key, tuple(sample_shape) + self.loc.shape, self.loc.dtype
        )
        return omt_mvn_sample(
            self.loc, self._unbroadcast_scale_tril, white
        )


class AVFMultivariateNormal(MultivariateNormal):
    """MVN with adaptive-velocity-field control-variate gradients
    (ref ``avf_mvn.py:13-67``).  ``control_var`` is a (2, L, D) tensor
    parameterizing infinitesimal-rotation control variates; it receives
    its own adaptation gradient through ``rsample``
    (``mvn_gradients.py``) and should be learned jointly with
    loc/scale_tril.

    Like the reference (``avf_mvn.py:48-56``), ``scale_tril`` must be
    2-D (a single factor); ``loc`` may carry batch dims (``expand``
    broadcasts it).  For batched factors ``jax.vmap``
    ``mvn_gradients.avf_mvn_sample`` directly."""

    def __init__(self, loc, scale_tril, control_var):
        loc = jnp.asarray(loc, jnp.result_type(float))
        scale_tril = jnp.asarray(scale_tril, loc.dtype)
        control_var = jnp.asarray(control_var, loc.dtype)
        if loc.ndim < 1:
            raise ValueError(
                "AVFMultivariateNormal loc must be at least 1-dimensional"
            )
        if scale_tril.ndim != 2:
            raise ValueError(
                "AVFMultivariateNormal scale_tril must be 2-dimensional "
                "(a single factor; vmap mvn_gradients.avf_mvn_sample for "
                "batched factors)"
            )
        if (
            control_var.ndim != 3
            or control_var.shape[0] != 2
            or control_var.shape[2] != loc.shape[-1]
        ):
            raise ValueError(
                "control_var should be of size 2 x L x D, where D is the "
                "dimension of the location parameter loc"
            )
        self.control_var = control_var
        super().__init__(loc, scale_tril=scale_tril)

    def expand(self, batch_shape, _instance=None):
        n = self.event_shape[0]
        return type(self)(
            jnp.broadcast_to(self.loc, tuple(batch_shape) + (n,)),
            self._unbroadcast_scale_tril,
            self.control_var,
        )

    def rsample(self, key, sample_shape=()):
        from .mvn_gradients import avf_mvn_sample

        white = jax.random.normal(
            key, tuple(sample_shape) + self.loc.shape, self.loc.dtype
        )
        return avf_mvn_sample(
            self.loc, self._unbroadcast_scale_tril, self.control_var, white
        )
