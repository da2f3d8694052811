"""Bijective transforms and the ``biject_to``/``transform_to`` registries.

Ref ``torch.distributions.transforms`` +
``pyro/distributions/transforms/__init__.py`` (registry entries at the bottom
of that file).  Transforms unconstrain supports for HMC/autoguides and build
``TransformedDistribution``; learnable flows live in ``flows.py``.
"""

from __future__ import annotations

import math
import weakref
from typing import Optional

import jax
import jax.numpy as jnp

from . import constraints
from .util import broadcast_shape, clamp_probs, sum_rightmost


class Transform:
    bijective = True
    domain: constraints.Constraint = constraints.real
    codomain: constraints.Constraint = constraints.real
    sign = 0

    def __init__(self):
        self._inv: Optional[weakref.ref] = None

    @property
    def inv(self) -> "Transform":
        inv = None
        if self._inv is not None:
            inv = self._inv()
        if inv is None:
            inv = _InverseTransform(self)
            self._inv = weakref.ref(inv)
        return inv

    @property
    def event_dim(self) -> int:
        """Deprecated torch alias: the shared domain/codomain event dim."""
        if self.domain.event_dim == self.codomain.event_dim:
            return self.domain.event_dim
        raise ValueError(
            "Please use either .domain.event_dim or .codomain.event_dim"
        )

    def clear_cache(self):
        """Drop any memoized (x, y) pairs (torch parity).  Only
        ``with_cache`` views hold state; plain transforms are a no-op.
        Recurses into composed parts."""
        for part in getattr(self, "parts", []) or getattr(
            self, "transforms", []
        ):
            part.clear_cache()

    def __call__(self, x):
        raise NotImplementedError

    def _inverse(self, y):
        raise NotImplementedError

    def log_abs_det_jacobian(self, x, y):
        raise NotImplementedError

    def forward_shape(self, shape):
        return tuple(shape)

    def inverse_shape(self, shape):
        return tuple(shape)

    def with_cache(self, cache_size=1):
        """Return a view that memoizes the last (x, y) pair so forward-only
        flows (Planar, Radial, Sylvester, ...) can be scored at their own
        samples without a closed-form inverse (torch ``cache_size=1``
        semantics).  Identity-based: a fresh jit trace allocates fresh
        tracer objects, so stale cached tracers are never matched."""
        if cache_size == 0:
            return self
        return _CachedTransform(self)

    def __eq__(self, other):
        return self is other

    def __hash__(self):
        return id(self)

    def __repr__(self):
        return self.__class__.__name__ + "()"


class _CachedTransform(Transform):
    """Identity-memoizing view of a transform (torch ``cache_size=1``).

    ``__call__`` records the exact ``(x, y)`` objects; ``_inverse`` returns
    the recorded ``x`` when handed the *same* ``y`` object, falling back to
    the base inverse otherwise.  This is what lets a guide score the value
    it just sampled through a flow with no closed-form inverse — the same
    mechanism as ``torch.distributions.transforms.Transform`` caching
    (ref ``transforms.py:77-100``)."""

    def __init__(self, base: Transform):
        super().__init__()
        self._base = base
        self._cached_x_y: Optional[tuple] = None

    @property
    def domain(self):  # type: ignore[override]
        return self._base.domain

    @property
    def codomain(self):  # type: ignore[override]
        return self._base.codomain

    @property
    def bijective(self):  # type: ignore[override]
        return self._base.bijective

    @property
    def sign(self):  # type: ignore[override]
        return self._base.sign

    def clear_cache(self):
        self._cached_x_y = None
        self._base.clear_cache()

    def __call__(self, x):
        cached = self._cached_x_y
        if cached is not None and cached[0] is x:
            return cached[1]
        y = self._base(x)
        self._cached_x_y = (x, y)
        return y

    def _inverse(self, y):
        cached = self._cached_x_y
        if cached is not None and cached[1] is y:
            return cached[0]
        x = self._base._inverse(y)
        self._cached_x_y = (x, y)
        return x

    def log_abs_det_jacobian(self, x, y):
        return self._base.log_abs_det_jacobian(x, y)

    def forward_shape(self, shape):
        return self._base.forward_shape(shape)

    def inverse_shape(self, shape):
        return self._base.inverse_shape(shape)

    def with_cache(self, cache_size=1):
        return self if cache_size else self._base

    def __getattr__(self, name):
        if name.startswith("_"):
            raise AttributeError(name)
        return getattr(self._base, name)

    def __repr__(self):
        return f"Cached({self._base!r})"


class _InverseTransform(Transform):
    def __init__(self, transform: Transform):
        super().__init__()
        self._base = transform

    @property
    def domain(self):  # type: ignore[override]
        return self._base.codomain

    @property
    def codomain(self):  # type: ignore[override]
        return self._base.domain

    @property
    def sign(self):  # type: ignore[override]
        return self._base.sign

    @property
    def inv(self):  # type: ignore[override]
        return self._base

    def __call__(self, x):
        return self._base._inverse(x)

    def _inverse(self, y):
        return self._base(y)

    def log_abs_det_jacobian(self, x, y):
        return -self._base.log_abs_det_jacobian(y, x)

    def forward_shape(self, shape):
        return self._base.inverse_shape(shape)

    def inverse_shape(self, shape):
        return self._base.forward_shape(shape)

    def with_cache(self, cache_size=1):
        return self._base.with_cache(cache_size).inv

    def __repr__(self):
        return f"{self._base}.inv"


class ComposeTransform(Transform):
    def __init__(self, parts):
        super().__init__()
        self.parts = list(parts)

    def with_cache(self, cache_size=1):
        return ComposeTransform(
            [p.with_cache(cache_size) for p in self.parts]
        )

    @property
    def domain(self):  # type: ignore[override]
        if not self.parts:
            return constraints.real
        domain = self.parts[0].domain
        # lift event_dim as in torch.distributions.ComposeTransform
        event_dim = self.parts[-1].codomain.event_dim
        for part in reversed(self.parts):
            event_dim += part.domain.event_dim - part.codomain.event_dim
            event_dim = max(event_dim, part.domain.event_dim)
        if event_dim > domain.event_dim:
            domain = constraints.independent(domain, event_dim - domain.event_dim)
        return domain

    @property
    def codomain(self):  # type: ignore[override]
        if not self.parts:
            return constraints.real
        codomain = self.parts[-1].codomain
        event_dim = self.parts[0].domain.event_dim
        for part in self.parts:
            event_dim += part.codomain.event_dim - part.domain.event_dim
            event_dim = max(event_dim, part.codomain.event_dim)
        if event_dim > codomain.event_dim:
            codomain = constraints.independent(
                codomain, event_dim - codomain.event_dim
            )
        return codomain

    @property
    def bijective(self):  # type: ignore[override]
        return all(p.bijective for p in self.parts)

    @property
    def sign(self):  # type: ignore[override]
        s = 1
        for p in self.parts:
            s = s * p.sign
        return s

    def __call__(self, x):
        for part in self.parts:
            x = part(x)
        return x

    def _inverse(self, y):
        for part in reversed(self.parts):
            y = part._inverse(y)
        return y

    def log_abs_det_jacobian(self, x, y):
        if not self.parts:
            return jnp.zeros_like(x)
        xs = [x]
        for part in self.parts[:-1]:
            xs.append(part(xs[-1]))
        xs.append(y)
        terms = []
        event_dim = self.domain.event_dim
        for part, x0, y0 in zip(self.parts, xs[:-1], xs[1:]):
            ladj = part.log_abs_det_jacobian(x0, y0)
            extra = event_dim - part.domain.event_dim
            if extra:
                ladj = sum_rightmost(ladj, extra)
            terms.append(ladj)
            event_dim += part.codomain.event_dim - part.domain.event_dim
        result = terms[0]
        for t in terms[1:]:
            result = result + t
        return result

    def forward_shape(self, shape):
        for part in self.parts:
            shape = part.forward_shape(shape)
        return shape

    def inverse_shape(self, shape):
        for part in reversed(self.parts):
            shape = part.inverse_shape(shape)
        return shape

    def __repr__(self):
        return "ComposeTransform({})".format(", ".join(map(repr, self.parts)))


class IndependentTransform(Transform):
    def __init__(self, base_transform: Transform, reinterpreted_batch_ndims: int):
        super().__init__()
        self.base_transform = base_transform
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims

    @property
    def domain(self):  # type: ignore[override]
        return constraints.independent(
            self.base_transform.domain, self.reinterpreted_batch_ndims
        )

    @property
    def codomain(self):  # type: ignore[override]
        return constraints.independent(
            self.base_transform.codomain, self.reinterpreted_batch_ndims
        )

    @property
    def bijective(self):  # type: ignore[override]
        return self.base_transform.bijective

    @property
    def sign(self):  # type: ignore[override]
        return self.base_transform.sign

    def __call__(self, x):
        return self.base_transform(x)

    def _inverse(self, y):
        return self.base_transform._inverse(y)

    def log_abs_det_jacobian(self, x, y):
        result = self.base_transform.log_abs_det_jacobian(x, y)
        return sum_rightmost(result, self.reinterpreted_batch_ndims)

    def forward_shape(self, shape):
        return self.base_transform.forward_shape(shape)

    def inverse_shape(self, shape):
        return self.base_transform.inverse_shape(shape)


class IdentityTransform(Transform):
    sign = 1

    def __call__(self, x):
        return x

    def _inverse(self, y):
        return y

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(jnp.shape(x))


identity_transform = IdentityTransform()


class ExpTransform(Transform):
    domain = constraints.real
    codomain = constraints.positive
    sign = 1

    def __call__(self, x):
        return jnp.exp(x)

    def _inverse(self, y):
        return jnp.log(y)

    def log_abs_det_jacobian(self, x, y):
        return x


class LogTransform(Transform):
    domain = constraints.positive
    codomain = constraints.real
    sign = 1

    def __call__(self, x):
        return jnp.log(x)

    def _inverse(self, y):
        return jnp.exp(y)

    def log_abs_det_jacobian(self, x, y):
        return -y


class SigmoidTransform(Transform):
    domain = constraints.real
    codomain = constraints.unit_interval
    sign = 1

    def __call__(self, x):
        return clamp_probs(jax.nn.sigmoid(x))

    def _inverse(self, y):
        y = clamp_probs(y)
        return jnp.log(y) - jnp.log1p(-y)

    def log_abs_det_jacobian(self, x, y):
        return -jax.nn.softplus(-x) - jax.nn.softplus(x)


class TanhTransform(Transform):
    domain = constraints.real
    codomain = constraints.interval(-1.0, 1.0)
    sign = 1

    def __call__(self, x):
        return jnp.tanh(x)

    def _inverse(self, y):
        return jnp.arctanh(jnp.clip(y, -1 + 1e-7, 1 - 1e-7))

    def log_abs_det_jacobian(self, x, y):
        return 2.0 * (math.log(2.0) - x - jax.nn.softplus(-2.0 * x))


class SoftplusTransform(Transform):
    domain = constraints.real
    codomain = constraints.softplus_positive
    sign = 1

    def __call__(self, x):
        return jax.nn.softplus(x)

    def _inverse(self, y):
        # inverse softplus: log(exp(y) - 1) = y + log(1 - exp(-y))
        return y + jnp.log(-jnp.expm1(-y))

    def log_abs_det_jacobian(self, x, y):
        return -jax.nn.softplus(-x)


class AbsTransform(Transform):
    bijective = False
    domain = constraints.real
    codomain = constraints.positive

    def __call__(self, x):
        return jnp.abs(x)

    def _inverse(self, y):
        return y


class AffineTransform(Transform):
    def __init__(self, loc, scale, event_dim: int = 0):
        super().__init__()
        self.loc = loc
        self.scale = scale
        self._event_dim = event_dim

    @property
    def domain(self):  # type: ignore[override]
        if self._event_dim == 0:
            return constraints.real
        return constraints.independent(constraints.real, self._event_dim)

    @property
    def codomain(self):  # type: ignore[override]
        if self._event_dim == 0:
            return constraints.real
        return constraints.independent(constraints.real, self._event_dim)

    @property
    def sign(self):  # type: ignore[override]
        if isinstance(self.scale, (int, float)):
            return 1 if self.scale > 0 else (-1 if self.scale < 0 else 0)
        return jnp.sign(self.scale)

    def __call__(self, x):
        return self.loc + self.scale * x

    def _inverse(self, y):
        return (y - self.loc) / self.scale

    def log_abs_det_jacobian(self, x, y):
        shape = jnp.shape(x)
        scale = self.scale
        if isinstance(scale, (int, float)):
            result = jnp.full(shape, math.log(abs(scale)))
        else:
            result = jnp.broadcast_to(jnp.log(jnp.abs(scale)), shape)
        if self._event_dim:
            result = sum_rightmost(result, self._event_dim)
        return result

    def forward_shape(self, shape):
        return broadcast_shape(
            shape, jnp.shape(self.loc), jnp.shape(self.scale)
        )

    inverse_shape = forward_shape


class PowerTransform(Transform):
    domain = constraints.positive
    codomain = constraints.positive
    sign = 1

    def __init__(self, exponent):
        super().__init__()
        self.exponent = exponent

    def __call__(self, x):
        return jnp.power(x, self.exponent)

    def _inverse(self, y):
        return jnp.power(y, 1.0 / self.exponent)

    def log_abs_det_jacobian(self, x, y):
        return jnp.broadcast_to(
            jnp.log(jnp.abs(self.exponent * y / x)), jnp.shape(x)
        )


class StickBreakingTransform(Transform):
    """Unconstrained R^{K-1} -> K-simplex (torch semantics)."""

    domain = constraints.real_vector
    codomain = constraints.simplex

    def __call__(self, x):
        offset = x.shape[-1] + 1 - jnp.cumsum(jnp.ones_like(x), axis=-1)
        z = clamp_probs(jax.nn.sigmoid(x - jnp.log(offset)))
        z_cumprod = jnp.cumprod(1 - z, axis=-1)
        pad_shape = x.shape[:-1] + (1,)
        z_padded = jnp.concatenate([z, jnp.ones(pad_shape, x.dtype)], axis=-1)
        ones = jnp.ones(pad_shape, x.dtype)
        z_cumprod_shifted = jnp.concatenate([ones, z_cumprod], axis=-1)
        return z_padded * z_cumprod_shifted

    def _inverse(self, y):
        y_crop = y[..., :-1]
        offset = y_crop.shape[-1] - jnp.cumsum(
            jnp.ones_like(y_crop), axis=-1
        ) + 1
        # stick lengths: sf_j = 1 - sum_{k<=j} y_k = remaining mass after j
        sf = 1.0 - jnp.cumsum(y_crop, axis=-1)
        sf = jnp.clip(sf, jnp.finfo(y.dtype).tiny)
        return jnp.log(y_crop) - jnp.log(sf) + jnp.log(offset)

    def log_abs_det_jacobian(self, x, y):
        offset = x.shape[-1] + 1 - jnp.cumsum(jnp.ones_like(x), axis=-1)
        z = clamp_probs(jax.nn.sigmoid(x - jnp.log(offset)))
        detJ = jnp.sum(
            jnp.log1p(-z) + jnp.log(clamp_probs(y[..., :-1])), axis=-1
        )
        return detJ

    def forward_shape(self, shape):
        return shape[:-1] + (shape[-1] + 1,)

    def inverse_shape(self, shape):
        return shape[:-1] + (shape[-1] - 1,)


class SoftmaxTransform(Transform):
    bijective = False
    domain = constraints.real_vector
    codomain = constraints.simplex

    def __call__(self, x):
        return jax.nn.softmax(x, axis=-1)

    def _inverse(self, y):
        return jnp.log(clamp_probs(y))


class OrderedTransform(Transform):
    """R^n -> ordered vectors: y0 = x0, y_i = y_{i-1} + exp(x_i).

    Ref ``pyro/distributions/transforms/ordered.py``.
    """

    domain = constraints.real_vector
    codomain = constraints.ordered_vector

    def __call__(self, x):
        z = jnp.concatenate(
            [x[..., :1], jnp.exp(x[..., 1:])], axis=-1
        )
        return jnp.cumsum(z, axis=-1)

    def _inverse(self, y):
        x0 = y[..., :1]
        rest = jnp.log(y[..., 1:] - y[..., :-1])
        return jnp.concatenate([x0, rest], axis=-1)

    def log_abs_det_jacobian(self, x, y):
        return jnp.sum(x[..., 1:], axis=-1)


class LowerCholeskyTransform(Transform):
    """Unconstrained matrices -> lower Cholesky (exp on the diagonal)."""

    domain = constraints.independent(constraints.real, 2)
    codomain = constraints.lower_cholesky

    def __call__(self, x):
        diag = jnp.exp(jnp.diagonal(x, axis1=-2, axis2=-1))
        return jnp.tril(x, -1) + _batched_diag_embed(diag)

    def _inverse(self, y):
        diag = jnp.log(jnp.diagonal(y, axis1=-2, axis2=-1))
        return jnp.tril(y, -1) + _batched_diag_embed(diag)

    def log_abs_det_jacobian(self, x, y):
        return jnp.sum(jnp.diagonal(x, axis1=-2, axis2=-1), axis=-1)


class SoftplusLowerCholeskyTransform(LowerCholeskyTransform):
    codomain = constraints.softplus_lower_cholesky

    def __call__(self, x):
        diag = jax.nn.softplus(jnp.diagonal(x, axis1=-2, axis2=-1))
        return jnp.tril(x, -1) + _batched_diag_embed(diag)

    def _inverse(self, y):
        d = jnp.diagonal(y, axis1=-2, axis2=-1)
        diag = d + jnp.log(-jnp.expm1(-d))
        return jnp.tril(y, -1) + _batched_diag_embed(diag)

    def log_abs_det_jacobian(self, x, y):
        d = jnp.diagonal(x, axis1=-2, axis2=-1)
        return jnp.sum(-jax.nn.softplus(-d), axis=-1)


class UnitLowerCholeskyTransform(Transform):
    domain = constraints.independent(constraints.real, 2)
    codomain = constraints.unit_lower_cholesky

    def __call__(self, x):
        n = x.shape[-1]
        return jnp.tril(x, -1) + jnp.eye(n, dtype=x.dtype)

    def _inverse(self, y):
        return y

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(x.shape[:-2])


class CholeskyTransform(Transform):
    """Positive-definite matrix <-> its lower Cholesky factor."""

    domain = constraints.positive_definite
    codomain = constraints.lower_cholesky

    def __call__(self, x):
        return jnp.linalg.cholesky(x)

    def _inverse(self, y):
        return y @ jnp.swapaxes(y, -1, -2)

    def log_abs_det_jacobian(self, x, y):
        n = x.shape[-1]
        order = jnp.arange(n, 0, -1, dtype=x.dtype)
        diag = jnp.diagonal(y, axis1=-2, axis2=-1)
        return -n * math.log(2.0) - jnp.sum(
            order * jnp.log(diag), axis=-1
        ) + jnp.zeros(x.shape[:-2])


class CorrCholeskyTransform(Transform):
    """Unconstrained vector of length n(n-1)/2 -> correlation Cholesky factor.

    Uses the signed stick-breaking construction (Stan reference manual; ref
    ``torch.distributions.transforms.CorrCholeskyTransform``).
    """

    domain = constraints.real_vector
    codomain = constraints.corr_cholesky

    def __call__(self, x):
        # Row-wise stick breaking over canonical partial correlations:
        #   L[i,j] = r[i,j] * prod_{k<j} sqrt(1 - r[i,k]^2)   for j < i
        #   L[i,i] =          prod_{k<i} sqrt(1 - r[i,k]^2)
        eps = jnp.finfo(x.dtype).eps
        t = jnp.clip(jnp.tanh(x), -1 + eps, 1 - eps)
        n = _vec_to_tril_matrix_size(x.shape[-1]) + 1
        r = _vec_to_tril_matrix(t, n, diagonal=-1)
        c = jnp.cumprod(jnp.clip(1 - r**2, eps), axis=-1)
        ones = jnp.ones(r.shape[:-1] + (1,), x.dtype)
        sqrt_shift = jnp.sqrt(jnp.concatenate([ones, c[..., :-1]], axis=-1))
        diag = jnp.diagonal(sqrt_shift, axis1=-2, axis2=-1)
        return jnp.tril(r * sqrt_shift, -1) + _batched_diag_embed(diag)

    def _inverse(self, y):
        eps = jnp.finfo(y.dtype).eps
        # z[i,j] = L[i,j] / sqrt(1 - sum_{k<j} L[i,k]^2)
        cumsum = jnp.cumsum(y**2, axis=-1) - y**2  # sum over k<j
        denom = jnp.sqrt(jnp.clip(1 - cumsum, eps))
        z = y / denom
        t = jnp.clip(z, -1 + eps, 1 - eps)
        x_mat = jnp.arctanh(t)
        return _tril_matrix_to_vec(x_mat, diagonal=-1)

    def log_abs_det_jacobian(self, x, y):
        eps = jnp.finfo(x.dtype).eps
        t = jnp.clip(jnp.tanh(x), -1 + eps, 1 - eps)
        # log|dy/dx| = sum log(1-t^2)  [tanh part]
        #            + stick-breaking part
        tanh_ladj = jnp.sum(jnp.log1p(-t**2), axis=-1)
        n = y.shape[-1]
        # stick-breaking jacobian: sum over rows i of
        # sum_{j<i} (i - j - 1 exponent?) — use standard result:
        # log det = sum_{i} sum_{j<i} 0.5*(i-j-1)*log(1 - z_{ij}^2)?  Use
        # direct: L[i,j] depends on z[i,:j+1]; triangular jacobian with
        # diagonal dL[i,j]/dz[i,j] = prod_{k<j} sqrt(1-z[i,k]^2)
        z2 = jnp.clip(t**2, None, 1 - eps)
        zmat = _vec_to_tril_matrix(jnp.log1p(-z2), n, diagonal=-1)
        cum = jnp.cumsum(zmat, axis=-1)  # sum_{k<=j}
        # shift to get sum_{k<j}
        shifted = cum - zmat
        ladj_sb = 0.5 * jnp.sum(
            _tril_matrix_to_vec(shifted, diagonal=-1), axis=-1
        )
        return tanh_ladj + ladj_sb

    def forward_shape(self, shape):
        d = shape[-1]
        n = _vec_to_tril_matrix_size(d) + 1
        return shape[:-1] + (n, n)

    def inverse_shape(self, shape):
        n = shape[-1]
        return shape[:-2] + (n * (n - 1) // 2,)


class CorrMatrixCholeskyTransform(CholeskyTransform):
    domain = constraints.corr_matrix
    codomain = constraints.corr_cholesky

    def log_abs_det_jacobian(self, x, y):
        # w.r.t. the strictly-lower free coordinates of the correlation
        # matrix (diag is fixed at 1), so the exponents drop by one and
        # the 2^-n diagonal factor disappears (ref ``cholesky.py:64``,
        # derivation in the LKJCholesky density)
        n = x.shape[-1]
        order = jnp.arange(n - 1, -1, -1, dtype=x.dtype)
        diag = jnp.diagonal(y, axis1=-2, axis2=-1)
        return -jnp.sum(order * jnp.log(diag), axis=-1)


# -- helpers -----------------------------------------------------------------


def _batched_diag_embed(diag):
    return diag[..., None] * jnp.eye(diag.shape[-1], dtype=diag.dtype)


def _vec_to_tril_matrix_size(d: int) -> int:
    # solve n(n+1)/2 = d  (for strictly-lower with diagonal=-1, rows n+1)
    n = int(round((math.sqrt(8.0 * d + 1.0) - 1.0) / 2.0))
    assert n * (n + 1) // 2 == d, f"invalid tril vec length {d}"
    return n


def _vec_to_tril_matrix(x, n: int, diagonal: int = 0):
    """Fill the lower triangle (inclusive of ``diagonal``) of an (n, n) matrix
    from a flat vector, row-major."""
    idx_rows, idx_cols = jnp.tril_indices(n, diagonal)
    out = jnp.zeros(x.shape[:-1] + (n, n), x.dtype)
    return out.at[..., idx_rows, idx_cols].set(x)


def _tril_matrix_to_vec(mat, diagonal: int = 0):
    n = mat.shape[-1]
    idx_rows, idx_cols = jnp.tril_indices(n, diagonal)
    return mat[..., idx_rows, idx_cols]


# -- constraint registry ------------------------------------------------------


class ConstraintRegistry:
    """Maps constraints to unconstraining transforms (torch semantics)."""

    def __init__(self):
        self._registry = {}

    def register(self, constraint, factory=None):
        if factory is None:
            return lambda f: self.register(constraint, f)
        if isinstance(constraint, constraints.Constraint):
            constraint = type(constraint)
        self._registry[constraint] = factory
        return factory

    def __call__(self, constraint) -> Transform:
        try:
            factory = self._registry[type(constraint)]
        except KeyError:
            raise NotImplementedError(
                f"Cannot transform {type(constraint).__name__} constraints"
            ) from None
        return factory(constraint)


biject_to = ConstraintRegistry()
transform_to = ConstraintRegistry()


@biject_to.register(constraints.real)
@transform_to.register(constraints.real)
def _transform_to_real(constraint):
    return identity_transform


@biject_to.register(constraints.independent)
@transform_to.register(constraints.independent)
def _biject_to_independent(constraint):
    base = biject_to(constraint.base_constraint)
    return IndependentTransform(base, constraint.reinterpreted_batch_ndims)


@biject_to.register(constraints.positive)
@biject_to.register(constraints.nonnegative)
@transform_to.register(constraints.positive)
@transform_to.register(constraints.nonnegative)
def _transform_to_positive(constraint):
    return ExpTransform()


@biject_to.register(constraints.softplus_positive)
@transform_to.register(constraints.softplus_positive)
def _transform_to_softplus_positive(constraint):
    return SoftplusTransform()


@biject_to.register(constraints.greater_than)
@biject_to.register(constraints.greater_than_eq)
@transform_to.register(constraints.greater_than)
@transform_to.register(constraints.greater_than_eq)
def _transform_to_greater_than(constraint):
    return ComposeTransform(
        [ExpTransform(), AffineTransform(constraint.lower_bound, 1.0)]
    )


@biject_to.register(constraints.less_than)
@transform_to.register(constraints.less_than)
def _transform_to_less_than(constraint):
    return ComposeTransform(
        [ExpTransform(), AffineTransform(constraint.upper_bound, -1.0)]
    )


@biject_to.register(constraints.unit_interval)
@transform_to.register(constraints.unit_interval)
def _transform_to_unit_interval(constraint):
    return SigmoidTransform()


@biject_to.register(constraints.interval)
@biject_to.register(constraints.open_interval)
@transform_to.register(constraints.interval)
@transform_to.register(constraints.open_interval)
def _transform_to_interval(constraint):
    scale = constraint.upper_bound - constraint.lower_bound
    return ComposeTransform(
        [SigmoidTransform(), AffineTransform(constraint.lower_bound, scale)]
    )


@biject_to.register(constraints.simplex)
def _biject_to_simplex(constraint):
    return StickBreakingTransform()


@transform_to.register(constraints.simplex)
def _transform_to_simplex(constraint):
    return SoftmaxTransform()


@biject_to.register(constraints.ordered_vector)
@transform_to.register(constraints.ordered_vector)
def _transform_to_ordered(constraint):
    return OrderedTransform()


@biject_to.register(constraints.positive_ordered_vector)
@transform_to.register(constraints.positive_ordered_vector)
def _transform_to_positive_ordered(constraint):
    return ComposeTransform([OrderedTransform(), ExpTransform()])


@biject_to.register(constraints.lower_cholesky)
@transform_to.register(constraints.lower_cholesky)
def _transform_to_lower_cholesky(constraint):
    return LowerCholeskyTransform()


@biject_to.register(constraints.softplus_lower_cholesky)
@transform_to.register(constraints.softplus_lower_cholesky)
def _transform_to_softplus_lower_cholesky(constraint):
    return SoftplusLowerCholeskyTransform()


@biject_to.register(constraints.unit_lower_cholesky)
@transform_to.register(constraints.unit_lower_cholesky)
def _transform_to_unit_lower_cholesky(constraint):
    return UnitLowerCholeskyTransform()


@biject_to.register(constraints.corr_cholesky)
@transform_to.register(constraints.corr_cholesky)
def _transform_to_corr_cholesky(constraint):
    return CorrCholeskyTransform()


@biject_to.register(constraints.corr_matrix)
@transform_to.register(constraints.corr_matrix)
def _transform_to_corr_matrix(constraint):
    return ComposeTransform(
        [CorrCholeskyTransform(), CholeskyTransform().inv]
    )


@biject_to.register(constraints.positive_definite)
@biject_to.register(constraints.positive_semidefinite)
@transform_to.register(constraints.positive_definite)
@transform_to.register(constraints.positive_semidefinite)
def _transform_to_positive_definite(constraint):
    return ComposeTransform(
        [LowerCholeskyTransform(), CholeskyTransform().inv]
    )


@transform_to.register(constraints.sphere)
def _transform_to_sphere(constraint):
    # surjection (radial projection), registered only in transform_to —
    # mirrors ref transforms/__init__.py:111
    from .transforms_extra import Normalize

    return Normalize()


__all__ = [
    "AbsTransform",
    "AffineTransform",
    "CholeskyTransform",
    "ComposeTransform",
    "CorrCholeskyTransform",
    "CorrMatrixCholeskyTransform",
    "ExpTransform",
    "IdentityTransform",
    "IndependentTransform",
    "LogTransform",
    "LowerCholeskyTransform",
    "OrderedTransform",
    "PowerTransform",
    "SigmoidTransform",
    "SoftmaxTransform",
    "SoftplusLowerCholeskyTransform",
    "SoftplusTransform",
    "StickBreakingTransform",
    "TanhTransform",
    "Transform",
    "UnitLowerCholeskyTransform",
    "biject_to",
    "identity_transform",
    "transform_to",
]


# -- full-catalog re-exports (lazy, PEP 562) -----------------------------------
# The learnable flows live in .flows / .flows_extra, the conditional
# machinery in .conditional, and the remaining fixed transforms in
# .transforms_extra; they are surfaced here so that
# ``pyro_tpu.distributions.transforms`` carries the reference's complete
# 89-name catalog (ref ``pyro/distributions/transforms/__init__.py``).

_LAZY_EXPORTS = {
    # .flows
    "AffineAutoregressive": "flows",
    "AffineCoupling": "flows",
    "BatchNorm": "flows",
    "BatchNormTransform": "flows",
    "Householder": "flows",
    "Permute": "flows",
    "Planar": "flows",
    "Radial": "flows",
    "Spline": "flows",
    "affine_autoregressive": "flows",
    "affine_coupling": "flows",
    "batchnorm": "flows",
    "householder": "flows",
    "permute": "flows",
    "planar": "flows",
    "radial": "flows",
    "spline": "flows",
    # .conditional
    "ComposeTransformModule": "conditional",
    # .transforms_extra
    "CatTransform": "transforms_extra",
    "CorrLCholeskyTransform": "transforms_extra",
    "CumulativeDistributionTransform": "transforms_extra",
    "DiscreteCosineTransform": "transforms_extra",
    "ELUTransform": "transforms_extra",
    "HaarTransform": "transforms_extra",
    "LeakyReLUTransform": "transforms_extra",
    "LowerCholeskyAffine": "transforms_extra",
    "Normalize": "transforms_extra",
    "PositiveDefiniteTransform": "transforms_extra",
    "PositivePowerTransform": "transforms_extra",
    "ReshapeTransform": "transforms_extra",
    "SimplexToOrderedTransform": "transforms_extra",
    "StackTransform": "transforms_extra",
    "elu": "transforms_extra",
    "leaky_relu": "transforms_extra",
    # .flows_extra
    "BlockAutoregressive": "flows_extra",
    "ConditionalAffineAutoregressive": "flows_extra",
    "ConditionalAffineCoupling": "flows_extra",
    "ConditionalGeneralizedChannelPermute": "flows_extra",
    "ConditionalHouseholder": "flows_extra",
    "ConditionalMatrixExponential": "flows_extra",
    "ConditionalNeuralAutoregressive": "flows_extra",
    "ConditionalPlanar": "flows_extra",
    "ConditionalRadial": "flows_extra",
    "ConditionalSpline": "flows_extra",
    "ConditionalSplineAutoregressive": "flows_extra",
    "ConditionedGeneralizedChannelPermute": "flows_extra",
    "ConditionedMatrixExponential": "flows_extra",
    "GeneralizedChannelPermute": "flows_extra",
    "MatrixExponential": "flows_extra",
    "NeuralAutoregressive": "flows_extra",
    "Polynomial": "flows_extra",
    "SplineAutoregressive": "flows_extra",
    "SplineCoupling": "flows_extra",
    "Sylvester": "flows_extra",
    "block_autoregressive": "flows_extra",
    "conditional_affine_autoregressive": "flows_extra",
    "conditional_affine_coupling": "flows_extra",
    "conditional_generalized_channel_permute": "flows_extra",
    "conditional_householder": "flows_extra",
    "conditional_matrix_exponential": "flows_extra",
    "conditional_neural_autoregressive": "flows_extra",
    "conditional_planar": "flows_extra",
    "conditional_radial": "flows_extra",
    "conditional_spline": "flows_extra",
    "conditional_spline_autoregressive": "flows_extra",
    "generalized_channel_permute": "flows_extra",
    "iterated": "flows_extra",
    "matrix_exponential": "flows_extra",
    "neural_autoregressive": "flows_extra",
    "polynomial": "flows_extra",
    "spline_autoregressive": "flows_extra",
    "spline_coupling": "flows_extra",
    "sylvester": "flows_extra",
}


def __getattr__(name):
    module = _LAZY_EXPORTS.get(name)
    if module is None:
        raise AttributeError(
            f"module {__name__!r} has no attribute {name!r}"
        )
    import importlib

    mod = importlib.import_module(f".{module}", __package__)
    value = getattr(mod, name)
    globals()[name] = value  # cache for subsequent lookups
    return value


__all__ = sorted(set(__all__) | set(_LAZY_EXPORTS))
