"""Structural / fixed (non-learnable) transforms completing the catalog.

Ref ``pyro/distributions/transforms/``: ``basic.py`` (ELU, LeakyReLU),
``discrete_cosine.py``, ``haar.py``, ``lower_cholesky_affine.py``,
``normalize.py``, ``power.py`` (PositivePowerTransform),
``simplex_to_ordered.py``, ``cholesky.py`` (CorrLCholeskyTransform), plus
the torch re-exports CatTransform / StackTransform / ReshapeTransform /
CumulativeDistributionTransform / PositiveDefiniteTransform.

All are pure functions of immutable arrays — no caching needed under JAX.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constraints
from ..ops.tensor_utils import (
    dct,
    haar_transform,
    idct,
    inverse_haar_transform,
)
from .transforms import (
    ComposeTransform,
    CorrCholeskyTransform,
    Transform,
)


class ELUTransform(Transform):
    """y = ELU(x) (ref ``basic.py:15``).

    The true range of ELU is (-1, inf); the reference declares
    ``codomain = positive`` (an upstream bug), corrected here.
    """

    domain = constraints.real
    codomain = constraints.greater_than(-1.0)
    bijective = True
    sign = 1

    def __call__(self, x):
        return jax.nn.elu(x)

    def _inverse(self, y):
        return jnp.where(y > 0, y, jnp.log1p(jnp.clip(y, -1 + 1e-12, 0.0)))

    def log_abs_det_jacobian(self, x, y):
        return -jax.nn.relu(-x)


class LeakyReLUTransform(Transform):
    """y = LeakyReLU(x) with slope 0.01 for x<0 (ref ``basic.py:52``)."""

    domain = constraints.real
    codomain = constraints.real
    bijective = True
    sign = 1

    def __call__(self, x):
        return jnp.where(x >= 0.0, x, 0.01 * x)

    def _inverse(self, y):
        return jnp.where(y >= 0.0, y, 100.0 * y)

    def log_abs_det_jacobian(self, x, y):
        return jnp.where(
            x >= 0.0, jnp.zeros_like(x), jnp.full_like(x, jnp.log(0.01))
        )


class DiscreteCosineTransform(Transform):
    """Orthonormal DCT-II along ``dim`` with optional frequency smoothing
    (ref ``discrete_cosine.py:12``); |jacobian| = 1."""

    bijective = True

    def __init__(self, dim: int = -1, smooth: float = 0.0):
        assert isinstance(dim, int) and dim < 0
        super().__init__()
        self.dim = dim
        self.smooth = float(smooth)

    @property
    def domain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, -self.dim)

    @property
    def codomain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, -self.dim)

    def _weight(self, size):
        freq = jnp.linspace(0.5, size - 0.5, size)
        w = freq**self.smooth
        return w / jnp.exp(jnp.mean(jnp.log(w)))  # |jacobian| = 1

    def __call__(self, x):
        dim = self.dim
        if dim != -1:
            x = jnp.swapaxes(x, dim, -1)
        y = dct(x)
        if self.smooth:
            y = y * self._weight(y.shape[-1])
        if dim != -1:
            y = jnp.swapaxes(y, dim, -1)
        return y

    def _inverse(self, y):
        dim = self.dim
        if dim != -1:
            y = jnp.swapaxes(y, dim, -1)
        if self.smooth:
            y = y / self._weight(y.shape[-1])
        x = idct(y)
        if dim != -1:
            x = jnp.swapaxes(x, dim, -1)
        return x

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(x.shape[: self.dim])

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.dim == other.dim
            and self.smooth == other.smooth
        )

    def __hash__(self):
        return hash((type(self), self.dim, self.smooth))


class HaarTransform(Transform):
    """Orthonormal discrete Haar transform along ``dim``
    (ref ``haar.py:11``); |jacobian| = 1."""

    bijective = True

    def __init__(self, dim: int = -1, flip: bool = False):
        assert isinstance(dim, int) and dim < 0
        super().__init__()
        self.dim = dim
        self.flip = flip

    @property
    def domain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, -self.dim)

    @property
    def codomain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, -self.dim)

    def __call__(self, x):
        dim = self.dim
        if dim != -1:
            x = jnp.swapaxes(x, dim, -1)
        if self.flip:
            x = jnp.flip(x, -1)
        y = haar_transform(x)
        if dim != -1:
            y = jnp.swapaxes(y, dim, -1)
        return y

    def _inverse(self, y):
        dim = self.dim
        if dim != -1:
            y = jnp.swapaxes(y, dim, -1)
        x = inverse_haar_transform(y)
        if self.flip:
            x = jnp.flip(x, -1)
        if dim != -1:
            x = jnp.swapaxes(x, dim, -1)
        return x

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(x.shape[: self.dim])

    def __eq__(self, other):
        return (
            type(self) is type(other)
            and self.dim == other.dim
            and self.flip == other.flip
        )

    def __hash__(self):
        return hash((type(self), self.dim, self.flip))


class LowerCholeskyAffine(Transform):
    """y = loc + scale_tril @ x (ref ``lower_cholesky_affine.py:12``)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    def __init__(self, loc, scale_tril):
        super().__init__()
        self.loc = jnp.asarray(loc)
        self.scale_tril = jnp.asarray(scale_tril)
        assert self.scale_tril.ndim >= 2

    def __call__(self, x):
        return self.loc + jnp.squeeze(
            self.scale_tril @ x[..., None], axis=-1
        )

    def _inverse(self, y):
        b = (y - self.loc)[..., None]
        tril = jnp.broadcast_to(
            self.scale_tril, b.shape[:-2] + self.scale_tril.shape[-2:]
        )
        return jax.scipy.linalg.solve_triangular(tril, b, lower=True)[
            ..., 0
        ]

    def log_abs_det_jacobian(self, x, y):
        ladj = jnp.sum(
            jnp.log(
                jnp.abs(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1))
            ),
            axis=-1,
        )
        return jnp.broadcast_to(ladj, x.shape[:-1])

    volume_preserving = False


class Normalize(Transform):
    """Safely project onto the unit sphere (ref ``normalize.py:13``);
    used by ``transform_to(constraints.sphere)``.  Not bijective — the
    inverse is the identity on the sphere."""

    domain = constraints.real_vector
    codomain = constraints.sphere
    bijective = False

    def __init__(self, p: int = 2):
        super().__init__()
        assert p >= 0
        self.p = p

    def __call__(self, x):
        if self.p == 2:
            norm = jnp.sqrt(
                jnp.clip(jnp.sum(x * x, axis=-1, keepdims=True), 1e-24)
            )
        else:
            norm = jnp.clip(
                jnp.sum(jnp.abs(x) ** self.p, axis=-1, keepdims=True)
                ** (1.0 / self.p),
                1e-12,
            )
        return x / norm

    def _inverse(self, y):
        return y  # already on the sphere


class PositivePowerTransform(Transform):
    """Sign-preserving power y = |x|^p sign(x) (ref ``power.py:9``)."""

    domain = constraints.real
    codomain = constraints.real
    bijective = True
    sign = 1

    def __init__(self, exponent):
        super().__init__()
        self.exponent = jnp.asarray(exponent)

    def __call__(self, x):
        return jnp.sign(x) * jnp.abs(x) ** self.exponent

    def _inverse(self, y):
        return jnp.sign(y) * jnp.abs(y) ** (1.0 / self.exponent)

    def log_abs_det_jacobian(self, x, y):
        return jnp.log(
            jnp.abs(self.exponent * y / jnp.where(x == 0.0, 1.0, x))
        )

    def forward_shape(self, shape):
        return jax.lax.broadcast_shapes(
            tuple(shape), jnp.shape(self.exponent)
        )

    inverse_shape = forward_shape


class PositiveDefiniteTransform(Transform):
    """Symmetrize: y = x + x^T with unconstrained lower-tri input mapped
    to a positive-definite matrix via X @ X^T on the Cholesky factor
    (ref torch ``PositiveDefiniteTransform``).  Here: y = tril(x) @
    tril(x)^T is handled by the constraint registry; this transform
    mirrors torch semantics y = A A^T from a full square matrix."""

    domain = constraints.independent(constraints.real, 2)
    codomain = constraints.positive_definite
    bijective = True

    def __call__(self, x):
        tril = jnp.tril(x, -1) + _softplus_diag(x)
        return tril @ jnp.swapaxes(tril, -1, -2)

    def _inverse(self, y):
        tril = jnp.linalg.cholesky(y)
        diag = jnp.diagonal(tril, axis1=-2, axis2=-1)
        inv_diag = diag + jnp.log(-jnp.expm1(-diag))
        return jnp.tril(tril, -1) + _batched_diag(inv_diag)


def _softplus_diag(x):
    return _batched_diag(
        jax.nn.softplus(jnp.diagonal(x, axis1=-2, axis2=-1))
    )


def _batched_diag(d):
    return d[..., None] * jnp.eye(d.shape[-1])


class SimplexToOrderedTransform(Transform):
    """Simplex -> ordered cutpoints via logistic CDF differences
    (ref ``simplex_to_ordered.py:12``; Betancourt ordinal regression)."""

    domain = constraints.simplex
    codomain = constraints.ordered_vector
    bijective = True

    def __init__(self, anchor_point=None):
        super().__init__()
        self.anchor_point = (
            jnp.asarray(0.0) if anchor_point is None else
            jnp.asarray(anchor_point)
        )

    def __call__(self, x):
        s = jnp.cumsum(x[..., :-1], axis=-1)
        return jax.scipy.special.logit(s) + self.anchor_point[..., None]

    def _inverse(self, y):
        y = y - self.anchor_point[..., None]
        s = jax.nn.sigmoid(y)
        s = jnp.concatenate(
            [jnp.zeros_like(s[..., :1]), s, jnp.ones_like(s[..., :1])],
            axis=-1,
        )
        return s[..., 1:] - s[..., :-1]

    def log_abs_det_jacobian(self, x, y):
        # J is lower triangular in the free simplex coords with diagonal
        # 1/(s_i (1-s_i)) where logit(s_i) = y_i - anchor; softplus
        # identity applies to the UN-anchored logits
        y = y - self.anchor_point[..., None]
        return jnp.sum(
            jax.nn.softplus(y) + jax.nn.softplus(-y), axis=-1
        )

    def forward_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] - 1,)

    def inverse_shape(self, shape):
        return tuple(shape[:-1]) + (shape[-1] + 1,)


class CorrLCholeskyTransform(CorrCholeskyTransform):
    """Legacy alias of :class:`CorrCholeskyTransform` kept for reference
    parity (ref ``cholesky.py:CorrLCholeskyTransform``)."""


class CumulativeDistributionTransform(Transform):
    """y = dist.cdf(x) (ref torch ``CumulativeDistributionTransform``)."""

    domain = constraints.real
    codomain = constraints.unit_interval
    bijective = True
    sign = 1

    def __init__(self, distribution):
        super().__init__()
        self.distribution = distribution

    def __call__(self, x):
        return self.distribution.cdf(x)

    def _inverse(self, y):
        return self.distribution.icdf(y)

    def log_abs_det_jacobian(self, x, y):
        return self.distribution.log_prob(x)


class ReshapeTransform(Transform):
    """Unit-jacobian reshape of trailing event dims (ref torch
    ``ReshapeTransform``)."""

    bijective = True

    def __init__(self, in_shape, out_shape):
        super().__init__()
        self.in_shape = tuple(in_shape)
        self.out_shape = tuple(out_shape)
        import numpy as _np

        if int(_np.prod(self.in_shape)) != int(_np.prod(self.out_shape)):
            raise ValueError(
                "in_shape and out_shape have different numbers of elements"
            )

    @property
    def domain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, len(self.in_shape))

    @property
    def codomain(self):  # type: ignore[override]
        return constraints.independent(
            constraints.real, len(self.out_shape)
        )

    def __call__(self, x):
        batch = x.shape[: x.ndim - len(self.in_shape)]
        return x.reshape(batch + self.out_shape)

    def _inverse(self, y):
        batch = y.shape[: y.ndim - len(self.out_shape)]
        return y.reshape(batch + self.in_shape)

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(x.shape[: x.ndim - len(self.in_shape)])

    def forward_shape(self, shape):
        n = len(self.in_shape)
        if tuple(shape[len(shape) - n :]) != self.in_shape:
            raise ValueError(f"shape mismatch: {shape} vs {self.in_shape}")
        return tuple(shape[: len(shape) - n]) + self.out_shape

    def inverse_shape(self, shape):
        n = len(self.out_shape)
        if tuple(shape[len(shape) - n :]) != self.out_shape:
            raise ValueError(f"shape mismatch: {shape} vs {self.out_shape}")
        return tuple(shape[: len(shape) - n]) + self.in_shape


class CatTransform(Transform):
    """Apply a sequence of transforms to contiguous slices along ``dim``
    (ref torch ``CatTransform``)."""

    def __init__(self, tseq, dim: int = 0, lengths=None):
        super().__init__()
        self.transforms = list(tseq)
        self.dim = dim
        if lengths is None:
            lengths = [1] * len(self.transforms)
        self.lengths = list(lengths)
        assert len(self.lengths) == len(self.transforms)

    @property
    def bijective(self):  # type: ignore[override]
        return all(t.bijective for t in self.transforms)

    def _slices(self, x):
        out = []
        start = 0
        for length in self.lengths:
            idx = [slice(None)] * x.ndim
            idx[self.dim] = slice(start, start + length)
            out.append(tuple(idx))
            start += length
        return out

    def __call__(self, x):
        return jnp.concatenate(
            [
                t(x[s])
                for t, s in zip(self.transforms, self._slices(x))
            ],
            axis=self.dim,
        )

    def _inverse(self, y):
        return jnp.concatenate(
            [
                t.inv(y[s])
                for t, s in zip(self.transforms, self._slices(y))
            ],
            axis=self.dim,
        )

    def log_abs_det_jacobian(self, x, y):
        slices = self._slices(x)
        terms = [
            t.log_abs_det_jacobian(x[s], y[s])
            for t, s in zip(self.transforms, slices)
        ]
        # per-element jacobians stay at input shape; sum elementwise terms
        dim = self.dim if self.dim >= 0 else self.dim + x.ndim
        expanded = []
        for term, s in zip(terms, slices):
            expanded.append(
                jnp.broadcast_to(term, x[s].shape)
                if term.ndim == x.ndim
                else jnp.broadcast_to(term[..., None], x[s].shape)
                if term.ndim == x.ndim - 1 and dim == x.ndim - 1
                else jnp.broadcast_to(term, x[s].shape)
            )
        return jnp.concatenate(expanded, axis=self.dim)

    @property
    def length(self):
        """Total length of the concatenated slices (torch parity)."""
        return sum(self.lengths)


class StackTransform(Transform):
    """Apply a sequence of transforms to slices stacked along ``dim``
    (ref torch ``StackTransform``)."""

    def __init__(self, tseq, dim: int = 0):
        super().__init__()
        self.transforms = list(tseq)
        self.dim = dim

    @property
    def bijective(self):  # type: ignore[override]
        return all(t.bijective for t in self.transforms)

    def _unstack(self, x):
        return [
            jnp.take(x, i, axis=self.dim)
            for i in range(x.shape[self.dim])
        ]

    def __call__(self, x):
        return jnp.stack(
            [t(xi) for t, xi in zip(self.transforms, self._unstack(x))],
            axis=self.dim,
        )

    def _inverse(self, y):
        return jnp.stack(
            [
                t.inv(yi)
                for t, yi in zip(self.transforms, self._unstack(y))
            ],
            axis=self.dim,
        )

    def log_abs_det_jacobian(self, x, y):
        return jnp.stack(
            [
                t.log_abs_det_jacobian(xi, yi)
                for t, xi, yi in zip(
                    self.transforms, self._unstack(x), self._unstack(y)
                )
            ],
            axis=self.dim,
        )


def elu() -> ELUTransform:
    """Factory for :class:`ELUTransform` (ref ``basic.py:40``)."""
    return ELUTransform()


def leaky_relu() -> LeakyReLUTransform:
    """Factory for :class:`LeakyReLUTransform` (ref ``basic.py:77``)."""
    return LeakyReLUTransform()


__all__ = [
    "CatTransform",
    "CorrLCholeskyTransform",
    "CumulativeDistributionTransform",
    "DiscreteCosineTransform",
    "ELUTransform",
    "HaarTransform",
    "LeakyReLUTransform",
    "LowerCholeskyAffine",
    "Normalize",
    "PositiveDefiniteTransform",
    "PositivePowerTransform",
    "ReshapeTransform",
    "SimplexToOrderedTransform",
    "StackTransform",
    "elu",
    "leaky_relu",
]
