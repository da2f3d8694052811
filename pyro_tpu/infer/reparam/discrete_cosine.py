"""Frequency-domain reparameterization (ref
``pyro/infer/reparam/discrete_cosine.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ...distributions import constraints
from ...distributions.transforms import Transform
from ...ops.tensor_utils import dct, idct
from .unit_jacobian import UnitJacobianReparam


class DiscreteCosineTransform(Transform):
    """Orthonormal DCT along a rightmost dim with optional 1/f^smooth
    scaling (ref ``pyro/distributions/transforms/discrete_cosine.py``)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    def __init__(self, dim: int = -1, smooth: float = 0.0):
        super().__init__()
        assert dim < 0
        self.event_dim_ = -dim
        self.dim = dim
        self.smooth = smooth

    @property
    def domain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, self.event_dim_)

    @property
    def codomain(self):  # type: ignore[override]
        return constraints.independent(constraints.real, self.event_dim_)

    def _weights(self, size):
        k = jnp.arange(size)
        return (1.0 + k) ** (-self.smooth)

    def __call__(self, x):
        y = dct(x, self.dim)
        if self.smooth:
            y = y * self._weights(x.shape[self.dim])
        return y

    def _inverse(self, y):
        if self.smooth:
            y = y / self._weights(y.shape[self.dim])
        return idct(y, self.dim)

    def log_abs_det_jacobian(self, x, y):
        ladj = jnp.zeros(x.shape[: x.ndim - self.event_dim_])
        if self.smooth:
            w = self._weights(x.shape[self.dim])
            ladj = ladj + jnp.sum(jnp.log(w)) * (
                x.size // x.shape[self.dim] // max(1, int(jnp.prod(jnp.asarray(x.shape[: x.ndim - self.event_dim_]))or 1))
            )
        return ladj


class DiscreteCosineReparam(UnitJacobianReparam):
    """Ref ``discrete_cosine.py:DiscreteCosineReparam``."""

    def __init__(self, dim: int = -1, smooth: float = 0.0, *, experimental_allow_batch: bool = False):
        super().__init__(
            DiscreteCosineTransform(dim=dim, smooth=smooth), suffix="dct"
        )
