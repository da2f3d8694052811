"""Haar wavelet reparameterization (ref ``pyro/infer/reparam/haar.py``)."""

from __future__ import annotations

import jax.numpy as jnp

from ...distributions import constraints
from ...distributions.transforms import Transform
from ...ops.tensor_utils import haar_transform, inverse_haar_transform
from .unit_jacobian import UnitJacobianReparam


class HaarTransform(Transform):
    """Orthonormal Haar transform (ref
    ``pyro/distributions/transforms/haar.py``)."""

    bijective = True

    def __init__(self, dim: int = -1, flip: bool = False):
        super().__init__()
        assert dim == -1, "only dim=-1 supported"
        self.dim = dim
        self.flip = flip

    domain = constraints.real_vector
    codomain = constraints.real_vector

    def __call__(self, x):
        if self.flip:
            x = jnp.flip(x, -1)
        return haar_transform(x)

    def _inverse(self, y):
        x = inverse_haar_transform(y)
        if self.flip:
            x = jnp.flip(x, -1)
        return x

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(x.shape[:-1])


class HaarReparam(UnitJacobianReparam):
    """Ref ``haar.py:HaarReparam``."""

    def __init__(self, dim: int = -1, flip: bool = False, *, experimental_allow_batch: bool = False):
        super().__init__(HaarTransform(dim=dim, flip=flip), suffix="haar")
