"""Multivariate distributions: MVN, Dirichlet, LKJ, projected normal.

Ref ``pyro/distributions/torch.py`` (MultivariateNormal, Dirichlet,
LowRankMultivariateNormal), ``lkj.py``, ``projected_normal.py``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy import special as jsp

from . import constraints
from .distribution import Distribution
from .util import broadcast_shape, clamp_probs, lazy_property


def _batch_mv(mat, vec):
    return jnp.einsum("...ij,...j->...i", mat, vec)


def _batch_trisolve_lower(L, x):
    """Solve L y = x with L lower-triangular, batched."""
    return jax.scipy.linalg.solve_triangular(L, x[..., None], lower=True)[
        ..., 0
    ]


class MultivariateNormal(Distribution):
    arg_constraints = {
        "loc": constraints.real_vector,
        "covariance_matrix": constraints.positive_definite,
        "precision_matrix": constraints.positive_definite,
        "scale_tril": constraints.lower_cholesky,
    }
    support = constraints.real_vector
    has_rsample = True
    reparametrized_params = ("loc", "covariance_matrix", "scale_tril")

    def __init__(
        self,
        loc,
        covariance_matrix=None,
        precision_matrix=None,
        scale_tril=None,
    ):
        given = sum(
            x is not None
            for x in (covariance_matrix, precision_matrix, scale_tril)
        )
        if given != 1:
            raise ValueError(
                "specify exactly one of covariance_matrix, precision_matrix, "
                "scale_tril"
            )
        loc = jnp.asarray(loc, jnp.result_type(loc, jnp.float32))
        if loc.ndim < 1:
            loc = loc[None]
        if scale_tril is not None:
            self._scale_tril_arg = scale_tril = jnp.asarray(scale_tril)
            mat = scale_tril
        elif covariance_matrix is not None:
            self._cov_arg = covariance_matrix = jnp.asarray(covariance_matrix)
            mat = covariance_matrix
        else:
            self._prec_arg = precision_matrix = jnp.asarray(precision_matrix)
            mat = precision_matrix
        batch_shape = broadcast_shape(loc.shape[:-1], mat.shape[:-2])
        event_shape = loc.shape[-1:]
        self.loc = jnp.broadcast_to(loc, batch_shape + event_shape)
        if scale_tril is not None:
            self._unbroadcast_scale_tril = scale_tril
        elif covariance_matrix is not None:
            self._unbroadcast_scale_tril = jnp.linalg.cholesky(
                covariance_matrix
            )
        else:
            # cholesky of precision → scale_tril via triangular inversion
            Lp = jnp.linalg.cholesky(precision_matrix)
            n = Lp.shape[-1]
            eye = jnp.broadcast_to(jnp.eye(n, dtype=Lp.dtype), Lp.shape)
            Linv = jax.scipy.linalg.solve_triangular(Lp, eye, lower=True)
            # scale_tril = cholesky(Sigma) where Sigma = (Lp Lp^T)^{-1}
            # = Linv^T Linv; take cholesky of that (flip trick):
            self._unbroadcast_scale_tril = jnp.linalg.cholesky(
                jnp.swapaxes(Linv, -1, -2) @ Linv
            )
        super().__init__(batch_shape, event_shape)

    @lazy_property
    def scale_tril(self):
        n = self.event_shape[0]
        return jnp.broadcast_to(
            self._unbroadcast_scale_tril, self.batch_shape + (n, n)
        )

    @lazy_property
    def covariance_matrix(self):
        L = self.scale_tril
        return L @ jnp.swapaxes(L, -1, -2)

    @lazy_property
    def precision_matrix(self):
        L = self.scale_tril
        n = L.shape[-1]
        eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return jnp.swapaxes(Linv, -1, -2) @ Linv

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        eps = jax.random.normal(key, shape, self.loc.dtype)
        return self.loc + _batch_mv(self.scale_tril, eps)

    def log_prob(self, value):
        diff = value - self.loc
        L = self.scale_tril
        y = _solve_lower_batched(L, diff)
        M = jnp.sum(y**2, axis=-1)
        half_log_det = jnp.sum(
            jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1
        )
        n = self.event_shape[0]
        return -0.5 * (n * math.log(2 * math.pi) + M) - half_log_det

    @property
    def mean(self):
        return self.loc

    @property
    def variance(self):
        return jnp.sum(self.scale_tril**2, axis=-1)

    def entropy(self):
        n = self.event_shape[0]
        half_log_det = jnp.sum(
            jnp.log(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1)),
            axis=-1,
        )
        return 0.5 * n * (1.0 + math.log(2 * math.pi)) + half_log_det

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        n = self.event_shape[0]
        return type(self)(
            jnp.broadcast_to(self.loc, batch_shape + (n,)),
            scale_tril=jnp.broadcast_to(
                self._unbroadcast_scale_tril, batch_shape + (n, n)
            ),
        )

    @property
    def mode(self):
        """Mode (torch parity)."""
        return self.loc


def _solve_lower_batched(L, diff):
    """Solve L y = diff batched, broadcasting batch dims of L and diff."""
    batch = broadcast_shape(L.shape[:-2], diff.shape[:-1])
    n = diff.shape[-1]
    L = jnp.broadcast_to(L, batch + (n, n))
    diff = jnp.broadcast_to(diff, batch + (n,))
    return jax.scipy.linalg.solve_triangular(L, diff[..., None], lower=True)[
        ..., 0
    ]


class LowRankMultivariateNormal(Distribution):
    """MVN with covariance = cov_factor @ cov_factor.T + diag(cov_diag)."""

    arg_constraints = {
        "loc": constraints.real_vector,
        "cov_factor": constraints.independent(constraints.real, 2),
        "cov_diag": constraints.independent(constraints.positive, 1),
    }
    support = constraints.real_vector
    has_rsample = True

    def __init__(self, loc, cov_factor, cov_diag):
        loc = jnp.asarray(loc, jnp.result_type(loc, jnp.float32))
        cov_factor = jnp.asarray(cov_factor)
        cov_diag = jnp.asarray(cov_diag)
        event_shape = loc.shape[-1:]
        batch_shape = broadcast_shape(
            loc.shape[:-1], cov_factor.shape[:-2], cov_diag.shape[:-1]
        )
        self.loc = jnp.broadcast_to(loc, batch_shape + event_shape)
        self.cov_factor = jnp.broadcast_to(
            cov_factor, batch_shape + cov_factor.shape[-2:]
        )
        self.cov_diag = jnp.broadcast_to(cov_diag, batch_shape + event_shape)
        super().__init__(batch_shape, event_shape)

    @lazy_property
    def _capacitance_tril(self):
        # C = I + W^T D^-1 W,  W = cov_factor, D = diag(cov_diag)
        W = self.cov_factor
        Dinv_W = W / self.cov_diag[..., None]
        K = jnp.swapaxes(W, -1, -2) @ Dinv_W
        K = K + jnp.eye(K.shape[-1], dtype=K.dtype)
        return jnp.linalg.cholesky(K)

    def rsample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        k1, k2 = jax.random.split(key)
        r = self.cov_factor.shape[-1]
        eps_W = jax.random.normal(k1, shape + (r,), self.loc.dtype)
        eps_D = jax.random.normal(k2, shape + self.event_shape, self.loc.dtype)
        return (
            self.loc
            + _batch_mv(self.cov_factor, eps_W)
            + jnp.sqrt(self.cov_diag) * eps_D
        )

    def log_prob(self, value):
        # Woodbury + matrix determinant lemma
        diff = value - self.loc
        W = self.cov_factor
        Dinv_diff = diff / self.cov_diag
        Wt_Dinv_diff = jnp.einsum("...ij,...i->...j", W, Dinv_diff)
        Ct = self._capacitance_tril
        y = _solve_lower_batched(Ct, Wt_Dinv_diff)
        M = jnp.sum(diff * Dinv_diff, axis=-1) - jnp.sum(y**2, axis=-1)
        log_det = jnp.sum(jnp.log(self.cov_diag), axis=-1) + 2 * jnp.sum(
            jnp.log(jnp.diagonal(Ct, axis1=-2, axis2=-1)), axis=-1
        )
        n = self.event_shape[0]
        return -0.5 * (n * math.log(2 * math.pi) + log_det + M)

    @property
    def mean(self):
        return self.loc

    @property
    def variance(self):
        return jnp.sum(self.cov_factor**2, axis=-1) + self.cov_diag

    @lazy_property
    def covariance_matrix(self):
        W = self.cov_factor
        return W @ jnp.swapaxes(W, -1, -2) + self.cov_diag[..., None] * jnp.eye(
            self.event_shape[0], dtype=W.dtype
        )

    @lazy_property
    def scale_tril(self):
        return jnp.linalg.cholesky(self.covariance_matrix)

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        n = self.event_shape[0]
        r = self.cov_factor.shape[-1]
        return LowRankMultivariateNormal(
            jnp.broadcast_to(self.loc, batch_shape + (n,)),
            jnp.broadcast_to(self.cov_factor, batch_shape + (n, r)),
            jnp.broadcast_to(self.cov_diag, batch_shape + (n,)),
        )

    @property
    def mode(self):
        """Mode (torch parity)."""
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @lazy_property
    def precision_matrix(self):
        """Woodbury inverse of W W^T + D (torch parity)."""
        W = self.cov_factor
        Dinv = 1.0 / self.cov_diag
        WtDinv = jnp.swapaxes(W, -1, -2) * Dinv[..., None, :]
        k = W.shape[-1]
        cap = jnp.eye(k) + WtDinv @ W
        Lc = jnp.linalg.cholesky(cap)
        X = jax.scipy.linalg.solve_triangular(Lc, WtDinv, lower=True)
        return (
            jnp.eye(self.event_shape[0]) * Dinv[..., None, :]
            - jnp.swapaxes(X, -1, -2) @ X
        )


class Dirichlet(Distribution):
    arg_constraints = {
        "concentration": constraints.independent(constraints.positive, 1)
    }
    support = constraints.simplex
    has_rsample = True
    reparametrized_params = ("concentration",)

    def __init__(self, concentration):
        self.concentration = jnp.asarray(
            concentration, jnp.result_type(concentration, jnp.float32)
        )
        super().__init__(
            self.concentration.shape[:-1], self.concentration.shape[-1:]
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        g = jax.random.gamma(key, self.concentration, shape)
        return clamp_probs(g / jnp.sum(g, axis=-1, keepdims=True))

    def log_prob(self, value):
        a = self.concentration
        return (
            jnp.sum((a - 1) * jnp.log(value), axis=-1)
            + jsp.gammaln(jnp.sum(a, axis=-1))
            - jnp.sum(jsp.gammaln(a), axis=-1)
        )

    @property
    def mean(self):
        return self.concentration / jnp.sum(
            self.concentration, axis=-1, keepdims=True
        )

    @property
    def variance(self):
        a0 = jnp.sum(self.concentration, axis=-1, keepdims=True)
        m = self.concentration / a0
        return m * (1 - m) / (a0 + 1)

    def entropy(self):
        a = self.concentration
        k = a.shape[-1]
        a0 = jnp.sum(a, axis=-1)
        return (
            jnp.sum(jsp.gammaln(a), axis=-1)
            - jsp.gammaln(a0)
            + (a0 - k) * jsp.digamma(a0)
            - jnp.sum((a - 1) * jsp.digamma(a), axis=-1)
        )

    def expand(self, batch_shape, _instance=None):
        batch_shape = tuple(batch_shape)
        return Dirichlet(
            jnp.broadcast_to(
                self.concentration, batch_shape + self.event_shape
            )
        )


    def conjugate_update(self, other):
        """Fuse two Dirichlet densities (ref ``torch.py:159``)."""
        assert isinstance(other, Dirichlet)
        concentration = self.concentration + other.concentration - 1
        updated = Dirichlet(concentration)

        def _log_normalizer(d):
            c = d.concentration
            return jax.lax.lgamma(jnp.sum(c, -1)) - jnp.sum(
                jax.lax.lgamma(c), -1
            )

        log_normalizer = (
            _log_normalizer(self)
            + _log_normalizer(other)
            - _log_normalizer(updated)
        )
        return updated, log_normalizer

    @property
    def mode(self):
        """Mode (torch parity): nan where all concentrations <= 1."""
        conc = jnp.clip(self.concentration - 1, 0, None)
        return conc / jnp.sum(conc, axis=-1, keepdims=True)


class LKJCholesky(Distribution):
    """LKJ prior over correlation-matrix Cholesky factors.

    Ref ``pyro/distributions/lkj.py`` — onion-method sampling.
    """

    arg_constraints = {"concentration": constraints.positive}
    support = constraints.corr_cholesky

    def __init__(self, dim, concentration=1.0):
        if dim < 2:
            raise ValueError("LKJCholesky requires dim >= 2")
        self.dim = dim
        self.concentration = jnp.asarray(
            concentration, jnp.result_type(concentration, jnp.float32)
        )
        batch_shape = jnp.shape(concentration)
        super().__init__(batch_shape, (dim, dim))
        self._pyro_init_args = ((dim,), (("concentration", concentration),))

    def sample(self, key, sample_shape=()):
        # Onion method (torch.distributions.LKJCholesky semantics)
        shape = tuple(sample_shape) + self.batch_shape
        d = self.dim
        k1, k2 = jax.random.split(key)
        # beta variates for each row 1..d-1
        order = jnp.arange(1, d, dtype=self.concentration.dtype)
        alpha = (
            self.concentration[..., None] + (d - 1 - order) / 2.0
        )  # shape batch + (d-1,)
        kb1, kb2 = jax.random.split(k1)
        g1 = jax.random.gamma(kb1, jnp.broadcast_to(order / 2.0, shape + (d - 1,)))
        g2 = jax.random.gamma(kb2, jnp.broadcast_to(alpha, shape + (d - 1,)))
        y = g1 / (g1 + g2)  # Beta(order/2, alpha) — squared row norms
        u = jax.random.normal(k2, shape + (d - 1, d - 1))
        # unit vectors per row from the normal draws (lower triangle rows)
        norms = jnp.linalg.norm(
            jnp.where(
                jnp.arange(d - 1)[None, :]
                <= jnp.arange(d - 1)[:, None],
                u,
                0.0,
            ),
            axis=-1,
            keepdims=True,
        )
        u_tril = jnp.where(
            jnp.arange(d - 1)[None, :] <= jnp.arange(d - 1)[:, None],
            u,
            0.0,
        )
        w = jnp.sqrt(y)[..., None] * u_tril / jnp.clip(norms, 1e-20)
        # assemble L: first row e_1, row i+1 = [w_i, sqrt(1-y_i)]
        L = jnp.zeros(shape + (d, d), u.dtype)
        L = L.at[..., 0, 0].set(1.0)
        L = L.at[..., 1:, :-1].set(w)
        diag_rest = jnp.sqrt(jnp.clip(1.0 - y, 1e-20))
        L = L.at[..., jnp.arange(1, d), jnp.arange(1, d)].set(diag_rest)
        return L

    def log_prob(self, value):
        diag = jnp.diagonal(value, axis1=-2, axis2=-1)[..., 1:]
        d = self.dim
        order = jnp.arange(2, d + 1, dtype=diag.dtype)
        order = 2 * (self.concentration[..., None] - 1) + d - order
        unnormalized = jnp.sum(order * jnp.log(diag), axis=-1)
        # normalization constant (torch.distributions.lkj_cholesky)
        dm1 = d - 1
        alpha = self.concentration + 0.5 * dm1
        denom = jsp.gammaln(alpha) * dm1
        numer = _mvlgamma(alpha - 0.5, dm1)
        pi_const = 0.5 * dm1 * math.log(math.pi)
        log_norm = pi_const + numer - denom
        return unnormalized - log_norm

    def expand(self, batch_shape, _instance=None):
        return LKJCholesky(
            self.dim,
            jnp.broadcast_to(self.concentration, tuple(batch_shape)),
        )


def _mvlgamma(a, p):
    i = jnp.arange(p, dtype=jnp.result_type(a, jnp.float32))
    return p * (p - 1) / 4 * math.log(math.pi) + jnp.sum(
        jsp.gammaln(a[..., None] - i / 2), axis=-1
    )


class ProjectedNormal(Distribution):
    """Radially-projected normal on the sphere.

    Ref ``pyro/distributions/projected_normal.py``.
    """

    arg_constraints = {"concentration": constraints.real_vector}
    support = constraints.sphere
    has_rsample = True

    def __init__(self, concentration):
        self.concentration = jnp.asarray(
            concentration, jnp.result_type(concentration, jnp.float32)
        )
        super().__init__(
            self.concentration.shape[:-1], self.concentration.shape[-1:]
        )

    def rsample(self, key, sample_shape=()):
        shape = self.shape(sample_shape)
        x = self.concentration + jax.random.normal(
            key, shape, self.concentration.dtype
        )
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    @property
    def mean(self):
        """Mean in the sense of the minimizer of expected squared geodesic
        distance — approximated by the normalized concentration."""
        return self.concentration / jnp.linalg.norm(
            self.concentration, axis=-1, keepdims=True
        )

    @property
    def mode(self):
        return self.mean

    def log_prob(self, value):
        dim = self.concentration.shape[-1]
        if dim == 2:
            return self._log_prob_2(value)
        if dim == 3:
            return self._log_prob_3(value)
        raise NotImplementedError(
            f"ProjectedNormal.log_prob implemented for dim in (2, 3); got {dim}"
        )

    def _log_prob_2(self, value):
        t = jnp.sum(self.concentration * value, axis=-1)
        t2 = t * t
        r2 = jnp.sum(self.concentration**2, axis=-1)
        perp_part = (t2 - r2) / 2 - math.log(2 * math.pi)
        norm_t = t / math.sqrt(2.0)
        # parallel part: log(t * Phi(t) * sqrt(2pi) + exp(-t^2/2))
        para_part = jnp.log(
            t * jsp.ndtr(t) * math.sqrt(2 * math.pi) + jnp.exp(-t2 / 2)
        )
        return perp_part + para_part

    def _log_prob_3(self, value):
        t = jnp.sum(self.concentration * value, axis=-1)
        t2 = t * t
        r2 = jnp.sum(self.concentration**2, axis=-1)
        perp_part = (t2 - r2) / 2 - 1.5 * math.log(2 * math.pi)
        norm_cdf = jsp.ndtr(t)
        para_part = jnp.log(
            (1 + t2) * norm_cdf * (2 * math.pi)
            + t * jnp.exp(-t2 / 2) * math.sqrt(2 * math.pi)
        ) - 0.5 * math.log(2 * math.pi)
        return perp_part + para_part

    def expand(self, batch_shape, _instance=None):
        return ProjectedNormal(
            jnp.broadcast_to(
                self.concentration, tuple(batch_shape) + self.event_shape
            )
        )
