"""GP covariance kernels (ref ``pyro/contrib/gp/kernels/``): RBF,
Matern32/52, Exponential, RationalQuadratic, Periodic, Cosine, Linear,
Polynomial, Constant, WhiteNoise, Brownian, Coregionalize, Sum/Product.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax.numpy as jnp

from ...distributions import constraints
from .parameterized import Parameterized


class Kernel(Parameterized):
    """Ref ``kernels/kernel.py``."""

    def __init__(self, input_dim: int, active_dims: Optional[Sequence[int]] = None, name=None):
        super().__init__(name)
        if active_dims is None:
            active_dims = list(range(input_dim))
        assert len(active_dims) == input_dim
        self.input_dim = input_dim
        self.active_dims = list(active_dims)

    def _slice_input(self, X):
        if X.ndim == 1:
            X = X[:, None]
        return X[:, self.active_dims]

    def forward(self, X, Z=None, diag: bool = False):
        raise NotImplementedError

    def __call__(self, X, Z=None, diag: bool = False):
        return self.forward(X, Z, diag)

    def __add__(self, other):
        return Sum(self, other)

    def __mul__(self, other):
        return Product(self, other)


class Combination(Kernel):
    def __init__(self, kern0: Kernel, kern1):
        super().__init__(kern0.input_dim, kern0.active_dims)
        self.kern0 = kern0
        self.kern1 = kern1


class Sum(Combination):
    def forward(self, X, Z=None, diag=False):
        k1 = (
            self.kern1.forward(X, Z, diag)
            if isinstance(self.kern1, Kernel)
            else self.kern1
        )
        return self.kern0.forward(X, Z, diag) + k1


class Product(Combination):
    def forward(self, X, Z=None, diag=False):
        k1 = (
            self.kern1.forward(X, Z, diag)
            if isinstance(self.kern1, Kernel)
            else self.kern1
        )
        return self.kern0.forward(X, Z, diag) * k1


class Isotropy(Kernel):
    """Base for stationary kernels (ref ``kernels/isotropic.py``)."""

    def __init__(self, input_dim, variance=1.0, lengthscale=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._register_param("variance", variance, constraints.positive)
        self._register_param("lengthscale", lengthscale, constraints.positive)

    def _square_scaled_dist(self, X, Z=None):
        X = self._slice_input(X)
        Z = X if Z is None else self._slice_input(Z)
        scaled_X = X / self.lengthscale
        scaled_Z = Z / self.lengthscale
        X2 = jnp.sum(scaled_X**2, -1, keepdims=True)
        Z2 = jnp.sum(scaled_Z**2, -1, keepdims=True)
        r2 = X2 - 2 * scaled_X @ scaled_Z.T + Z2.T
        return jnp.clip(r2, 0.0)

    def _scaled_dist(self, X, Z=None):
        return jnp.sqrt(self._square_scaled_dist(X, Z) + 1e-12)

    def _diag(self, X):
        return jnp.broadcast_to(self.variance, (X.shape[0],))


class RBF(Isotropy):
    def forward(self, X, Z=None, diag=False):
        if diag:
            return self._diag(X)
        r2 = self._square_scaled_dist(X, Z)
        return self.variance * jnp.exp(-0.5 * r2)


class RationalQuadratic(Isotropy):
    def __init__(self, input_dim, variance=1.0, lengthscale=1.0, scale_mixture=1.0, active_dims=None, name=None):
        super().__init__(input_dim, variance, lengthscale, active_dims, name)
        self._register_param(
            "scale_mixture", scale_mixture, constraints.positive
        )

    def forward(self, X, Z=None, diag=False):
        if diag:
            return self._diag(X)
        r2 = self._square_scaled_dist(X, Z)
        return self.variance * (
            1 + 0.5 / self.scale_mixture * r2
        ) ** (-self.scale_mixture)


class Exponential(Isotropy):
    def forward(self, X, Z=None, diag=False):
        if diag:
            return self._diag(X)
        r = self._scaled_dist(X, Z)
        return self.variance * jnp.exp(-r)


class Matern32(Isotropy):
    def forward(self, X, Z=None, diag=False):
        if diag:
            return self._diag(X)
        r = self._scaled_dist(X, Z)
        s3r = math.sqrt(3) * r
        return self.variance * (1 + s3r) * jnp.exp(-s3r)


class Matern52(Isotropy):
    def forward(self, X, Z=None, diag=False):
        if diag:
            return self._diag(X)
        r = self._scaled_dist(X, Z)
        s5r = math.sqrt(5) * r
        return self.variance * (1 + s5r + (5.0 / 3) * r**2) * jnp.exp(-s5r)


class Periodic(Kernel):
    """Ref ``kernels/periodic.py``."""

    def __init__(self, input_dim, variance=1.0, lengthscale=1.0, period=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._register_param("variance", variance, constraints.positive)
        self._register_param("lengthscale", lengthscale, constraints.positive)
        self._register_param("period", period, constraints.positive)

    def forward(self, X, Z=None, diag=False):
        if diag:
            return jnp.broadcast_to(self.variance, (X.shape[0],))
        X = self._slice_input(X)
        Z = X if Z is None else self._slice_input(Z)
        d = X[:, None, :] - Z[None, :, :]
        # per-dimension lengthscales divide INSIDE the feature sum
        # (ref periodic.py:77: scaled_sin = sin(pi d / p) / l)
        scaled_sin = jnp.sin(math.pi * d / self.period) / self.lengthscale
        return self.variance * jnp.exp(-2 * jnp.sum(scaled_sin**2, -1))


class Cosine(Isotropy):
    def forward(self, X, Z=None, diag=False):
        if diag:
            return self._diag(X)
        r = self._scaled_dist(X, Z)
        return self.variance * jnp.cos(r)


class DotProduct(Kernel):
    def __init__(self, input_dim, variance=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._register_param("variance", variance, constraints.positive)

    def _dot_product(self, X, Z=None, diag=False):
        X = self._slice_input(X)
        if diag:
            return jnp.sum(X**2, -1)
        Z = X if Z is None else self._slice_input(Z)
        return X @ Z.T


class Linear(DotProduct):
    def forward(self, X, Z=None, diag=False):
        return self.variance * self._dot_product(X, Z, diag)


class Polynomial(DotProduct):
    def __init__(self, input_dim, variance=1.0, bias=1.0, degree=2, active_dims=None, name=None):
        super().__init__(input_dim, variance, active_dims, name)
        self._register_param("bias", bias, constraints.positive)
        assert isinstance(degree, int) and degree >= 1
        self.degree = degree

    def forward(self, X, Z=None, diag=False):
        return self.variance * (
            self.bias + self._dot_product(X, Z, diag)
        ) ** self.degree


class Constant(Kernel):
    def __init__(self, input_dim, variance=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._register_param("variance", variance, constraints.positive)

    def forward(self, X, Z=None, diag=False):
        if diag:
            return jnp.broadcast_to(self.variance, (X.shape[0],))
        n = X.shape[0]
        m = n if Z is None else Z.shape[0]
        return jnp.broadcast_to(self.variance, (n, m))


class WhiteNoise(Kernel):
    def __init__(self, input_dim, variance=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._register_param("variance", variance, constraints.positive)

    def forward(self, X, Z=None, diag=False):
        if diag:
            return jnp.broadcast_to(self.variance, (X.shape[0],))
        if Z is None:
            return self.variance * jnp.eye(X.shape[0])
        return jnp.zeros((X.shape[0], Z.shape[0]))


class Brownian(Kernel):
    """Ref ``kernels/brownian.py`` (1-D inputs)."""

    def __init__(self, input_dim=1, variance=1.0, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        self._register_param("variance", variance, constraints.positive)

    def forward(self, X, Z=None, diag=False):
        X = self._slice_input(X)[:, 0]
        if diag:
            return self.variance * jnp.abs(X)
        Zv = X if Z is None else self._slice_input(Z)[:, 0]
        same_sign = (X[:, None] * Zv[None, :]) >= 0
        return jnp.where(
            same_sign,
            self.variance
            * jnp.minimum(jnp.abs(X)[:, None], jnp.abs(Zv)[None, :]),
            0.0,
        )


class Coregionalize(Kernel):
    """Low-rank + diagonal task covariance (ref
    ``kernels/coregionalize.py``)."""

    def __init__(self, input_dim, rank=None, components=None, diagonal=None, active_dims=None, name=None):
        super().__init__(input_dim, active_dims, name)
        rank = input_dim if rank is None else rank
        if components is None:
            import jax

            # expected value eye/2, as upstream (coregionalize.py:55)
            components = (0.5 / rank) ** 0.5 * jax.random.normal(
                jax.random.key(0), (input_dim, rank)
            )
        self._register_param("components", components)
        if diagonal is None:
            # total kernel has expected value eye (ref coregionalize.py:68)
            diagonal = 0.5 * jnp.ones(input_dim)
        self._register_param("diagonal", diagonal, constraints.positive)

    def forward(self, X, Z=None, diag=False):
        X = self._slice_input(X)
        components = self.components
        diagonal = self.diagonal
        Xc = X @ components
        if diag:
            return jnp.sum(Xc**2, -1) + jnp.sum(X**2 * diagonal, -1)
        Zc = Xc if Z is None else self._slice_input(Z) @ components
        Zd = X if Z is None else self._slice_input(Z)
        return Xc @ Zc.T + (X * diagonal) @ Zd.T


class Transforming(Kernel):
    """Base for kernels derived from another kernel by a transform
    (ref ``kernels/kernel.py:131``)."""

    def __init__(self, kern: Kernel):
        super().__init__(kern.input_dim, kern.active_dims)
        self.kern = kern


class Exponent(Transforming):
    """k_new(x, z) = exp(k(x, z))  (ref ``kernels/kernel.py:145``)."""

    def forward(self, X, Z=None, diag=False):
        return jnp.exp(self.kern(X, Z, diag=diag))


class VerticalScaling(Transforming):
    """k_new(x, z) = f(x) k(x, z) f(z)  (ref ``kernels/kernel.py:156``)."""

    def __init__(self, kern: Kernel, vscaling_fn):
        super().__init__(kern)
        self.vscaling_fn = vscaling_fn

    def forward(self, X, Z=None, diag=False):
        if diag:
            f = self.vscaling_fn(X)
            return f * self.kern(X, Z, diag=diag) * f
        fX = self.vscaling_fn(X)[:, None]
        fZ = fX.T if Z is None else self.vscaling_fn(Z)[None, :]
        return fX * self.kern(X, Z, diag=diag) * fZ


def _horner_evaluate(x, coef):
    """Polynomial evaluation by Horner's method (ref ``kernel.py:187``)."""
    b = coef[-1]
    for c in reversed(coef[:-1]):
        b = c + b * x
    return b


class Warping(Transforming):
    """Deep kernel learning: k_new(x, z) = q(k(f(x), f(z))) with an input
    warping function f (e.g. a neural feature extractor) and an optional
    non-negative output polynomial q (ref ``kernels/kernel.py:199``;
    Wilson et al., "Deep Kernel Learning")."""

    def __init__(self, kern: Kernel, iwarping_fn=None, owarping_coef=None):
        super().__init__(kern)
        self.iwarping_fn = iwarping_fn
        if owarping_coef is not None:
            if any(
                not isinstance(c, int) and c < 0 for c in owarping_coef
            ):
                raise ValueError(
                    "Coefficients of the polynomial must be non-negative."
                )
            if len(owarping_coef) < 2 and sum(owarping_coef) == 0:
                raise ValueError(
                    "The output warping polynomial should have degree >= 1."
                )
        self.owarping_coef = owarping_coef

    def forward(self, X, Z=None, diag=False):
        if self.iwarping_fn is None:
            K = self.kern(X, Z, diag=diag)
        elif Z is None:
            K = self.kern(self.iwarping_fn(X), None, diag=diag)
        else:
            K = self.kern(
                self.iwarping_fn(X), self.iwarping_fn(Z), diag=diag
            )
        if self.owarping_coef is None:
            return K
        return _horner_evaluate(K, self.owarping_coef)
