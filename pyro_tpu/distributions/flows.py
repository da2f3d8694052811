"""Normalizing flows (learnable bijective transforms).

Ref ``pyro/distributions/transforms/``: ``affine_autoregressive.py``,
``affine_coupling.py``, ``spline.py`` (Durkan et al. 2019 rational-quadratic
splines), ``planar.py``, ``radial.py``, ``householder.py``, ``permute.py``,
``batchnorm.py``, plus the helper factories at the bottom of
``transforms/__init__.py``.

Parameters are ordinary ``pyro.param`` sites (created by the factory
functions), so flows train under the jitted SVI step like any guide.
"""

from __future__ import annotations

import math
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp

from . import constraints
from .transforms import Transform
from ..primitives import param as pyro_param


class AffineAutoregressive(Transform):
    """IAF (ref ``affine_autoregressive.py:409``): one-pass forward
    (sampling) direction; inverse is a sequential scan over dims."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    sign = 1

    def __init__(
        self,
        autoregressive_nn: Callable,
        log_scale_min_clip: float = -5.0,
        log_scale_max_clip: float = 3.0,
        stable: bool = False,
    ):
        super().__init__()
        self.arn = autoregressive_nn
        self.log_scale_min_clip = log_scale_min_clip
        self.log_scale_max_clip = log_scale_max_clip
        self.stable = stable

    def _params(self, x):
        mean, log_scale = self.arn(x)
        log_scale = jnp.clip(
            log_scale, self.log_scale_min_clip, self.log_scale_max_clip
        )
        return mean, log_scale

    def __call__(self, x):
        mean, log_scale = self._params(x)
        return mean + jnp.exp(log_scale) * x

    def _inverse(self, y):
        """Sequential inversion (ref ``affine_autoregressive.py:_inverse``)."""
        D = y.shape[-1]

        def body(i, x):
            mean, log_scale = self._params(x)
            xi = (y[..., i] - mean[..., i]) * jnp.exp(-log_scale[..., i])
            return x.at[..., i].set(xi)

        return jax.lax.fori_loop(0, D, body, jnp.zeros_like(y))

    def log_abs_det_jacobian(self, x, y):
        _, log_scale = self._params(x)
        return jnp.sum(log_scale, axis=-1)

    autoregressive = True


class AffineCoupling(Transform):
    """RealNVP coupling layer (ref ``affine_coupling.py:395``)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    sign = 1

    def __init__(
        self,
        split_dim: int,
        hypernet: Callable,
        log_scale_min_clip: float = -5.0,
        log_scale_max_clip: float = 3.0,
    ):
        super().__init__()
        self.split_dim = split_dim
        self.hypernet = hypernet
        self.log_scale_min_clip = log_scale_min_clip
        self.log_scale_max_clip = log_scale_max_clip

    def _params(self, x1):
        mean, log_scale = self.hypernet(x1)
        log_scale = jnp.clip(
            log_scale, self.log_scale_min_clip, self.log_scale_max_clip
        )
        return mean, log_scale

    def __call__(self, x):
        x1, x2 = x[..., : self.split_dim], x[..., self.split_dim :]
        mean, log_scale = self._params(x1)
        y2 = mean + jnp.exp(log_scale) * x2
        return jnp.concatenate([x1, y2], axis=-1)

    def _inverse(self, y):
        y1, y2 = y[..., : self.split_dim], y[..., self.split_dim :]
        mean, log_scale = self._params(y1)
        x2 = (y2 - mean) * jnp.exp(-log_scale)
        return jnp.concatenate([y1, x2], axis=-1)

    def log_abs_det_jacobian(self, x, y):
        x1 = x[..., : self.split_dim]
        _, log_scale = self._params(x1)
        return jnp.sum(log_scale, axis=-1)


def _searchsorted(sorted_seq, x):
    return jnp.sum(x[..., None] >= sorted_seq[..., :-1], axis=-1) - 1


class Spline(Transform):
    """Element-wise monotonic rational-quadratic spline
    (ref ``spline.py:645``; Durkan et al. 2019)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    sign = 1

    def __init__(self, widths, heights, derivatives, bound: float = 3.0):
        """widths/heights: (..., D, K) unnormalized; derivatives:
        (..., D, K-1) unnormalized (interior knots)."""
        super().__init__()
        self.bound = bound
        K = widths.shape[-1]
        self.widths = jax.nn.softmax(widths, axis=-1)
        self.heights = jax.nn.softmax(heights, axis=-1)
        self.derivatives = jax.nn.softplus(derivatives)
        self._K = K

    def _spline_params(self):
        B = self.bound
        w = self.widths * 2 * B
        h = self.heights * 2 * B
        cw = jnp.cumsum(w, axis=-1)
        cw = jnp.concatenate(
            [jnp.full(cw.shape[:-1] + (1,), -B), -B + cw], axis=-1
        )
        ch = jnp.cumsum(h, axis=-1)
        ch = jnp.concatenate(
            [jnp.full(ch.shape[:-1] + (1,), -B), -B + ch], axis=-1
        )
        # boundary derivatives fixed to 1 for linear tails
        ones = jnp.ones(self.derivatives.shape[:-1] + (1,))
        d = jnp.concatenate([ones, self.derivatives, ones], axis=-1)
        return w, h, cw, ch, d

    def _rqs(self, x, inverse: bool):
        w, h, cw, ch, d = self._spline_params()
        B = self.bound
        inside = (x > -B) & (x < B)
        x_clipped = jnp.clip(x, -B + 1e-6, B - 1e-6)
        ref = ch if inverse else cw
        k = jnp.clip(_searchsorted(ref, x_clipped), 0, self._K - 1)

        def take(a, offset=0):
            a_b = jnp.broadcast_to(a, k.shape + a.shape[-1:])
            return jnp.take_along_axis(
                a_b, k[..., None] + offset, axis=-1
            )[..., 0]

        wk = take(w)
        hk = take(h)
        cwk = take(cw)
        chk = take(ch)
        dk = take(d)
        dk1 = take(d, offset=1)
        sk = hk / wk

        if not inverse:
            xi = (x_clipped - cwk) / wk
            xi1m = 1 - xi
            num = hk * (sk * xi**2 + dk * xi * xi1m)
            den = sk + (dk1 + dk - 2 * sk) * xi * xi1m
            y = chk + num / den
            ladj_num = sk**2 * (
                dk1 * xi**2 + 2 * sk * xi * xi1m + dk * xi1m**2
            )
            ladj = jnp.log(ladj_num) - 2 * jnp.log(den)
            y = jnp.where(inside, y, x)
            ladj = jnp.where(inside, ladj, 0.0)
            return y, ladj
        else:
            y = x_clipped
            a = hk * (sk - dk) + (y - chk) * (dk1 + dk - 2 * sk)
            b = hk * dk - (y - chk) * (dk1 + dk - 2 * sk)
            c = -sk * (y - chk)
            disc = b**2 - 4 * a * c
            disc = jnp.clip(disc, 0.0)
            xi = 2 * c / (-b - jnp.sqrt(disc))
            xi = jnp.clip(xi, 1e-6, 1 - 1e-6)
            x_out = xi * wk + cwk
            xi1m = 1 - xi
            den = sk + (dk1 + dk - 2 * sk) * xi * xi1m
            ladj_num = sk**2 * (
                dk1 * xi**2 + 2 * sk * xi * xi1m + dk * xi1m**2
            )
            ladj = -(jnp.log(ladj_num) - 2 * jnp.log(den))
            x_out = jnp.where(inside, x_out, x)
            ladj = jnp.where(inside, ladj, 0.0)
            return x_out, ladj

    def __call__(self, x):
        y, _ = self._rqs(x, inverse=False)
        return y

    def _inverse(self, y):
        x, _ = self._rqs(y, inverse=True)
        return x

    def log_abs_det_jacobian(self, x, y):
        _, ladj = self._rqs(x, inverse=False)
        return jnp.sum(ladj, axis=-1)


class Planar(Transform):
    """Planar flow (ref ``planar.py``; Rezende & Mohamed 2015).  Forward
    only (no closed-form inverse)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    def __init__(self, bias, u, w):
        super().__init__()
        self.bias = bias
        self.u = u
        self.w = w

    def _constrained_u(self):
        # ensure invertibility: w.u >= -1
        wu = jnp.sum(self.w * self.u, axis=-1, keepdims=True)
        m = -1 + jax.nn.softplus(wu)
        wnorm2 = jnp.sum(self.w**2, axis=-1, keepdims=True)
        return self.u + (m - wu) * self.w / jnp.clip(wnorm2, 1e-12)

    def __call__(self, x):
        u = self._constrained_u()
        act = jnp.tanh(
            jnp.sum(self.w * x, axis=-1, keepdims=True) + self.bias
        )
        return x + u * act

    def _inverse(self, y):
        raise NotImplementedError(
            "Planar flow has no closed-form inverse; use it only in the "
            "sampling direction"
        )

    def log_abs_det_jacobian(self, x, y):
        u = self._constrained_u()
        pre = jnp.sum(self.w * x, axis=-1) + jnp.reshape(self.bias, ())
        psi = (1 - jnp.tanh(pre) ** 2)[..., None] * self.w
        det = 1 + jnp.sum(psi * u, axis=-1)
        return jnp.log(jnp.abs(det) + 1e-12)


class Radial(Transform):
    """Radial flow (ref ``radial.py``)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector

    def __init__(self, x0, alpha_prime, beta_prime):
        super().__init__()
        self.x0 = x0
        self.alpha_prime = alpha_prime
        self.beta_prime = beta_prime

    def _ab(self):
        alpha = jax.nn.softplus(self.alpha_prime)
        beta = -alpha + jax.nn.softplus(self.beta_prime)
        return alpha, beta

    def __call__(self, x):
        alpha, beta = self._ab()
        diff = x - self.x0
        r = jnp.linalg.norm(diff, axis=-1, keepdims=True)
        h = 1.0 / (alpha + r)
        return x + beta * h * diff

    def _inverse(self, y):
        raise NotImplementedError(
            "Radial flow has no closed-form inverse"
        )

    def log_abs_det_jacobian(self, x, y):
        alpha, beta = self._ab()
        alpha = jnp.reshape(alpha, ())  # scalar params of shape (1,)
        beta = jnp.reshape(beta, ())
        diff = x - self.x0
        r = jnp.linalg.norm(diff, axis=-1)
        h = 1.0 / (alpha + r)
        h_prime = -(h**2)
        d = x.shape[-1]
        bh = beta * h
        return (d - 1) * jnp.log1p(bh) + jnp.log1p(bh + beta * h_prime * r)


class Householder(Transform):
    """Product of Householder reflections (ref ``householder.py``)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    sign = 1  # composition of reflections; |det| = 1

    def __init__(self, u):
        """u: (count, D) reflection vectors."""
        super().__init__()
        self.u = u

    def _reflect(self, x, reverse: bool):
        us = self.u if not reverse else self.u[::-1]
        for i in range(us.shape[0]):
            v = us[i]
            v = v / jnp.linalg.norm(v)
            x = x - 2 * jnp.sum(x * v, axis=-1, keepdims=True) * v
        return x

    def __call__(self, x):
        return self._reflect(x, reverse=False)

    def _inverse(self, y):
        return self._reflect(y, reverse=True)

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(x.shape[:-1])

    volume_preserving = True


class Permute(Transform):
    """Fixed permutation (ref ``permute.py``)."""

    domain = constraints.real_vector
    codomain = constraints.real_vector
    bijective = True

    def __init__(self, permutation):
        super().__init__()
        self.permutation = jnp.asarray(permutation)

    def __call__(self, x):
        return x[..., self.permutation]

    def _inverse(self, y):
        inv = jnp.argsort(self.permutation)
        return y[..., inv]

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros(x.shape[:-1])

    volume_preserving = True

    @property
    def inv_permutation(self):
        """Inverse permutation indices (ref permute.py:60)."""
        return jnp.argsort(self.permutation)


class BatchNormTransform(Transform):
    """Stabilizing batchnorm layer for flow stacks (ref ``batchnorm.py``).
    Uses provided (loc, scale) statistics — no running-state mutation under
    jit; callers supply current batch stats or learned params."""

    domain = constraints.real_vector
    codomain = constraints.real_vector

    def __init__(self, loc, log_scale):
        super().__init__()
        self.loc = loc
        self.log_scale = log_scale

    def __call__(self, x):
        return (x - self.loc) * jnp.exp(-self.log_scale)

    def _inverse(self, y):
        return y * jnp.exp(self.log_scale) + self.loc

    def log_abs_det_jacobian(self, x, y):
        return jnp.broadcast_to(
            -jnp.sum(self.log_scale, axis=-1),
            x.shape[:-1],
        )

    @property
    def constrained_gamma(self):
        """Positive scale (ref batchnorm.py:96): here the learned
        log_scale is stored directly, so gamma = exp(-log_scale)."""
        return jnp.exp(-self.log_scale)


# -- factory helpers (ref transforms/__init__.py bottom) ----------------------


def affine_autoregressive(
    name: str, input_dim: int, hidden_dims: Optional[Sequence[int]] = None,
    **kwargs,
) -> AffineAutoregressive:
    """Create an IAF whose MADE params live in the param store."""
    from ..nn import flax_module
    from ..nn.auto_reg_nn import AutoRegressiveNN

    if hidden_dims is None:
        hidden_dims = [3 * input_dim + 1]
    arn = flax_module(
        name,
        AutoRegressiveNN(input_dim, tuple(hidden_dims)),
        jnp.zeros((1, input_dim)),
    )
    return AffineAutoregressive(arn, **kwargs)


def affine_coupling(
    name: str, input_dim: int, hidden_dims: Optional[Sequence[int]] = None,
    split_dim: Optional[int] = None, **kwargs,
) -> AffineCoupling:
    from ..nn import flax_module
    from ..nn.dense_nn import DenseNN

    if split_dim is None:
        split_dim = input_dim // 2
    if hidden_dims is None:
        hidden_dims = [10 * input_dim]
    out_dim = input_dim - split_dim
    net = flax_module(
        name,
        DenseNN(split_dim, tuple(hidden_dims), (out_dim, out_dim)),
        jnp.zeros((1, split_dim)),
    )
    return AffineCoupling(split_dim, net, **kwargs)


def spline(name: str, input_dim: int, count_bins: int = 8, bound: float = 3.0) -> Spline:
    w = pyro_param(f"{name}$$$widths", jnp.zeros((input_dim, count_bins)))
    h = pyro_param(f"{name}$$$heights", jnp.zeros((input_dim, count_bins)))
    d = pyro_param(
        f"{name}$$$derivatives", jnp.zeros((input_dim, count_bins - 1))
    )
    return Spline(w, h, d, bound=bound)


def planar(name: str, input_dim: int) -> Planar:
    b = pyro_param(f"{name}$$$bias", jnp.zeros((1,)))
    u = pyro_param(
        f"{name}$$$u",
        0.01 * jax.random.normal(jax.random.key(0), (input_dim,)),
    )
    w = pyro_param(
        f"{name}$$$w",
        0.01 * jax.random.normal(jax.random.key(1), (input_dim,)),
    )
    return Planar(b, u, w)


def radial(name: str, input_dim: int) -> Radial:
    x0 = pyro_param(f"{name}$$$x0", jnp.zeros((input_dim,)))
    a = pyro_param(f"{name}$$$alpha", jnp.zeros((1,)))
    b = pyro_param(f"{name}$$$beta", jnp.zeros((1,)))
    return Radial(x0, a, b)


def householder(name: str, input_dim: int, count_transforms: int = 1) -> Householder:
    u = pyro_param(
        f"{name}$$$u",
        0.1
        * jax.random.normal(
            jax.random.key(2), (count_transforms, input_dim)
        )
        + jnp.ones((count_transforms, input_dim)),
    )
    return Householder(u)


def permute(permutation) -> Permute:
    return Permute(permutation)


# reference-parity alias (ref ``batchnorm.py`` exports the class as
# ``BatchNorm``)
BatchNorm = BatchNormTransform


def batchnorm(name: str, input_dim: int) -> BatchNormTransform:
    """Create a BatchNorm flow whose (loc, log_scale) are param-store
    sites (ref ``transforms/__init__.py`` ``batchnorm`` helper)."""
    loc = pyro_param(f"{name}$$$loc", jnp.zeros(input_dim))
    log_scale = pyro_param(f"{name}$$$log_scale", jnp.zeros(input_dim))
    return BatchNormTransform(loc, log_scale)
