"""Gamma-Gaussian algebra for Student-T HMM marginalization.

Ref ``pyro/ops/gamma_gaussian.py``: ``Gamma:16`` (non-normalized),
``GammaGaussian:47``, ``gamma_and_mvn_to_gamma_gaussian:343``,
``matrix_and_mvn_to_gamma_gaussian:390``, ``gamma_gaussian_tensordot:434``.

A ``GammaGaussian`` over ``(x, s)`` is the non-normalized density

    exp(c) * s^alpha * exp(s * (i.x - 0.5 x'Px - beta)),

i.e. a Gaussian in ``x`` whose info vector and precision are both scaled
by a shared mixing variable ``s`` with a Gamma-shaped prior.  Integrating
``s`` out yields a multivariate Student-T — this is how Student-T HMMs
marginalize in O(log T): the contraction over time is a pairwise
``gamma_gaussian_tensordot`` halving exactly like ``ops/gaussian.py``.

Everything is pure jnp and pytree-registered so the objects flow through
``jit``/``vmap``; the per-round batched Cholesky factorizations map onto
the MXU.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..distributions.util import broadcast_shape
from .gaussian import _cholesky_solve, _tri_solve


@jax.tree_util.register_pytree_node_class
class Gamma:
    """Non-normalized Gamma density ``exp(c) * s^(conc-1) * exp(-rate*s)``
    (ref ``gamma_gaussian.py:16``)."""

    def __init__(self, log_normalizer, concentration, rate):
        self.log_normalizer = jnp.asarray(log_normalizer)
        self.concentration = jnp.asarray(concentration)
        self.rate = jnp.asarray(rate)

    def tree_flatten(self):
        return (self.log_normalizer, self.concentration, self.rate), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.log_normalizer, obj.concentration, obj.rate = children
        return obj

    def log_density(self, s):
        return (
            self.log_normalizer
            + (self.concentration - 1) * jnp.log(s)
            - self.rate * s
        )

    def logsumexp(self):
        """Integrate out ``s``."""
        return (
            self.log_normalizer
            + jax.lax.lgamma(self.concentration)
            - self.concentration * jnp.log(self.rate)
        )


@jax.tree_util.register_pytree_node_class
class GammaGaussian:
    """Ref ``gamma_gaussian.py:47``.  Parameterization:

        log p(x, s) = log_normalizer + alpha*log(s)
                      + s * (x.i - 0.5 x'Px - beta)

    so conditioned on ``s``, ``x ~ N(info=s*i, precision=s*P)``; the
    marginal of ``s`` after integrating ``x`` is Gamma-shaped.
    """

    def __init__(self, log_normalizer, info_vec, precision, alpha, beta):
        self.log_normalizer = jnp.asarray(log_normalizer)
        self.info_vec = jnp.asarray(info_vec)
        self.precision = jnp.asarray(precision)
        self.alpha = jnp.asarray(alpha)
        self.beta = jnp.asarray(beta)

    def tree_flatten(self):
        return (
            self.log_normalizer,
            self.info_vec,
            self.precision,
            self.alpha,
            self.beta,
        ), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        (
            obj.log_normalizer,
            obj.info_vec,
            obj.precision,
            obj.alpha,
            obj.beta,
        ) = children
        return obj

    @property
    def dim(self) -> int:
        return self.info_vec.shape[-1]

    @property
    def batch_shape(self) -> Tuple[int, ...]:
        return broadcast_shape(
            self.log_normalizer.shape,
            self.info_vec.shape[:-1],
            self.precision.shape[:-2],
            self.alpha.shape,
            self.beta.shape,
        )

    def expand(self, batch_shape) -> "GammaGaussian":
        n = self.dim
        batch_shape = tuple(batch_shape)
        return GammaGaussian(
            jnp.broadcast_to(self.log_normalizer, batch_shape),
            jnp.broadcast_to(self.info_vec, batch_shape + (n,)),
            jnp.broadcast_to(self.precision, batch_shape + (n, n)),
            jnp.broadcast_to(self.alpha, batch_shape),
            jnp.broadcast_to(self.beta, batch_shape),
        )

    def reshape(self, batch_shape) -> "GammaGaussian":
        n = self.dim
        batch_shape = tuple(batch_shape)
        return GammaGaussian(
            jnp.reshape(self.log_normalizer, batch_shape),
            jnp.reshape(self.info_vec, batch_shape + (n,)),
            jnp.reshape(self.precision, batch_shape + (n, n)),
            jnp.reshape(self.alpha, batch_shape),
            jnp.reshape(self.beta, batch_shape),
        )

    def __getitem__(self, index) -> "GammaGaussian":
        if not isinstance(index, tuple):
            index = (index,)
        return GammaGaussian(
            self.log_normalizer[index],
            self.info_vec[index + (slice(None),)],
            self.precision[index + (slice(None), slice(None))],
            self.alpha[index],
            self.beta[index],
        )

    @staticmethod
    def cat(parts, dim: int = 0) -> "GammaGaussian":
        if dim < 0:
            dim += len(parts[0].batch_shape)
        return GammaGaussian(
            jnp.concatenate([p.log_normalizer for p in parts], axis=dim),
            jnp.concatenate([p.info_vec for p in parts], axis=dim),
            jnp.concatenate([p.precision for p in parts], axis=dim),
            jnp.concatenate([p.alpha for p in parts], axis=dim),
            jnp.concatenate([p.beta for p in parts], axis=dim),
        )

    def event_pad(self, left: int = 0, right: int = 0) -> "GammaGaussian":
        lr = [(0, 0)] * (self.info_vec.ndim - 1) + [(left, right)]
        info_vec = jnp.pad(self.info_vec, lr)
        lr2 = [(0, 0)] * (self.precision.ndim - 2) + [(left, right)] * 2
        precision = jnp.pad(self.precision, lr2)
        # alpha/beta are the reparameterized (dim-invariant) quantities,
        # so padding leaves them unchanged (ref :152-165).
        return GammaGaussian(
            self.log_normalizer, info_vec, precision, self.alpha, self.beta
        )

    def event_permute(self, perm) -> "GammaGaussian":
        info_vec = self.info_vec[..., perm]
        precision = self.precision[..., perm][..., perm, :]
        return GammaGaussian(
            self.log_normalizer, info_vec, precision, self.alpha, self.beta
        )

    def __add__(self, other) -> "GammaGaussian":
        return GammaGaussian(
            self.log_normalizer + other.log_normalizer,
            self.info_vec + other.info_vec,
            self.precision + other.precision,
            self.alpha + other.alpha,
            self.beta + other.beta,
        )

    def log_density(self, value, s):
        """log p(value, s); mainly for testing (ref :193)."""
        if value.shape[-1] == 0:
            batch = broadcast_shape(
                value.shape[:-1], jnp.shape(s), self.batch_shape
            )
            return (
                self.alpha * jnp.log(s)
                - self.beta * s
                + jnp.broadcast_to(self.log_normalizer, batch)
            )
        result = (-0.5) * jnp.einsum(
            "...ij,...j->...i", self.precision, value
        )
        result = result + self.info_vec
        result = jnp.sum(value * result, -1)
        return (
            self.alpha * jnp.log(s)
            + (result - self.beta) * s
            + self.log_normalizer
        )

    def condition(self, value) -> "GammaGaussian":
        """Condition on the trailing ``value.shape[-1]`` event coordinates
        (ref :213); includes the density of the bound coordinates."""
        n = self.dim - value.shape[-1]
        info_a = self.info_vec[..., :n]
        info_b = self.info_vec[..., n:]
        P_aa = self.precision[..., :n, :n]
        P_ab = self.precision[..., :n, n:]
        P_bb = self.precision[..., n:, n:]
        b = value

        info_vec = info_a - jnp.einsum("...ij,...j->...i", P_ab, b)
        beta = (
            self.beta
            + 0.5 * jnp.sum(jnp.einsum("...ij,...j->...i", P_bb, b) * b, -1)
            - jnp.sum(b * info_b, -1)
        )
        return GammaGaussian(
            self.log_normalizer, info_vec, P_aa, self.alpha, beta
        )

    def marginalize(self, left: int = 0, right: int = 0) -> "GammaGaussian":
        """Integrate out the leading ``left`` / trailing ``right`` event
        coordinates (ref :251).  Think of the Gaussian block as having
        precision ``s*P`` — the ``s``-dependent normalizer shifts alpha
        and the quadratic completion shifts beta."""
        if left == 0 and right == 0:
            return self
        if left > 0 and right > 0:
            raise NotImplementedError
        n = self.dim
        n_b = left + right
        a = slice(left, n - right)
        b = slice(None, left) if left else slice(n - right, None)

        P_aa = self.precision[..., a, a]
        P_ba = self.precision[..., b, a]
        P_bb = self.precision[..., b, b]
        L_b = jnp.linalg.cholesky(P_bb)
        P_a = _tri_solve(L_b, P_ba)
        P_at = jnp.swapaxes(P_a, -1, -2)
        precision = P_aa - P_at @ P_a

        info_a = self.info_vec[..., a]
        info_b = self.info_vec[..., b]
        b_tmp = _tri_solve(L_b, info_b[..., None])
        info_vec = info_a
        if n_b < n:
            info_vec = info_vec - (P_at @ b_tmp)[..., 0]

        alpha = self.alpha - 0.5 * n_b
        beta = self.beta - 0.5 * jnp.sum(b_tmp[..., 0] ** 2, -1)
        log_normalizer = (
            self.log_normalizer
            + 0.5 * n_b * math.log(2 * math.pi)
            - jnp.sum(
                jnp.log(jnp.diagonal(L_b, axis1=-2, axis2=-1)), -1
            )
        )
        return GammaGaussian(log_normalizer, info_vec, precision, alpha, beta)

    def compound(self):
        """Integrate out the mixing variable ``s``; the marginal of ``x``
        is a multivariate Student-T (ref :298)."""
        from ..distributions.extra import MultivariateStudentT
        from .tensor_utils import precision_to_scale_tril

        concentration = self.alpha - 0.5 * self.dim + 1
        scale_tril = precision_to_scale_tril(self.precision)
        stu = jnp.einsum(
            "...ji,...j->...i", scale_tril, self.info_vec
        )
        u_Pinv_u = jnp.sum(stu**2, -1)
        rate = self.beta - 0.5 * u_Pinv_u
        loc = jnp.einsum("...ij,...j->...i", scale_tril, stu)
        scale_tril = scale_tril * jnp.sqrt(rate / concentration)[..., None, None]
        return MultivariateStudentT(2 * concentration, loc, scale_tril)

    def event_logsumexp(self) -> Gamma:
        """Integrate out all of ``x``; the remaining density over ``s``
        is Gamma-shaped (ref :317)."""
        n = self.dim
        L = jnp.linalg.cholesky(self.precision)
        Lu = _tri_solve(L, self.info_vec[..., None])[..., 0]
        u_P_u = jnp.sum(Lu**2, -1)
        concentration = self.alpha - 0.5 * n + 1
        rate = self.beta - 0.5 * u_P_u
        log_normalizer = (
            self.log_normalizer
            + 0.5 * n * math.log(2 * math.pi)
            - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), -1)
        )
        return Gamma(log_normalizer, concentration, rate)


def gamma_and_mvn_to_gamma_gaussian(gamma, mvn) -> GammaGaussian:
    """Joint of ``s ~ gamma`` and ``x | s ~ scale(mvn, s)``
    (ref ``gamma_gaussian.py:343``)."""
    from .gaussian import mvn_to_gaussian

    g = mvn_to_gaussian(mvn)
    n = g.dim
    info_vec = g.info_vec
    precision = g.precision
    loc = _cholesky_solve(
        jnp.linalg.cholesky(precision), info_vec[..., None]
    )[..., 0]
    quad = 0.5 * jnp.sum(info_vec * loc, -1)

    alpha = gamma.concentration + (0.5 * n - 1)
    # the s-scaled quadratic -0.5 loc'P loc moves from the Gaussian
    # normalizer into beta (it is multiplied by s in the joint)
    beta = gamma.rate + quad
    # g.log_normalizer = -0.5n log(2π) - log|L| - quad, so the unit-scale
    # Gaussian normalization constant is -(g.log_normalizer + quad); the
    # joint normalizer also absorbs the Gamma's own constant (ref :343).
    gaussian_logsumexp = -(g.log_normalizer + quad)
    log_normalizer = -Gamma(
        gaussian_logsumexp, gamma.concentration, gamma.rate
    ).logsumexp()
    return GammaGaussian(log_normalizer, info_vec, precision, alpha, beta)


def matrix_and_mvn_to_gamma_gaussian(matrix, mvn) -> GammaGaussian:
    """Joint GammaGaussian over ``(x, y)`` for the noisy affine map
    ``y = x @ matrix + scale(mvn, s).sample()`` (ref :390)."""
    from .gaussian import matrix_and_mvn_to_gaussian

    x_dim, y_dim = matrix.shape[-2:]
    g = matrix_and_mvn_to_gaussian(matrix, mvn)
    info_y = g.info_vec[..., x_dim:]
    P_yy = g.precision[..., x_dim:, x_dim:]
    loc_y = _cholesky_solve(jnp.linalg.cholesky(P_yy), info_y[..., None])[
        ..., 0
    ]
    beta = 0.5 * jnp.sum(info_y * loc_y, -1)
    alpha = jnp.full(jnp.shape(beta), 0.5 * y_dim)
    # g.log_normalizer includes the -0.5 loc'P loc quadratic, which in the
    # gamma-Gaussian belongs to beta (it is scaled by s); shift it out.
    return GammaGaussian(
        g.log_normalizer + beta, g.info_vec, g.precision, alpha, beta
    )


def gamma_gaussian_tensordot(
    x: GammaGaussian, y: GammaGaussian, dims: int = 0
) -> GammaGaussian:
    """Contract the last ``dims`` coords of x with the first ``dims`` of y,
    sharing the mixing variable ``s`` (ref :434)."""
    na = x.dim - dims
    nb = dims
    nc = y.dim - dims
    joint = x.event_pad(right=nc) + y.event_pad(left=na)
    if nb == 0:
        return joint
    n = joint.dim
    perm = jnp.concatenate(
        [jnp.arange(na), jnp.arange(na + nb, n), jnp.arange(na, na + nb)]
    )
    return joint.event_permute(perm).marginalize(right=nb)


def sequential_gamma_gaussian_tensordot_homogeneous(
    gg: GammaGaussian,
) -> GammaGaussian:
    """Markov contraction specialized for chains whose precision is
    SHARED across the trailing time axis (time-invariant Student-T /
    scale-mixture HMMs: data enters only info vectors and the ``beta``
    rate).  One shared factorization per halving level; batched work is
    O(T n^2) vector solves plus scalar alpha/beta/logZ updates.  See
    ``ops/gaussian.py:sequential_gaussian_tensordot_homogeneous`` for
    the scheme; this adds the Gamma bookkeeping: per pairwise
    elimination of the shared n coords, ``alpha -= n/2`` and
    ``beta -= 0.5 |L^{-1} i_b|^2`` (ref ``marginalize``:251)."""
    assert gg.precision.ndim == 2
    two_n = gg.dim
    assert two_n % 2 == 0
    n = two_n // 2
    T = gg.batch_shape[-1]
    P = gg.precision
    info = jnp.broadcast_to(gg.info_vec, gg.batch_shape + (two_n,))
    logZ = jnp.broadcast_to(gg.log_normalizer, gg.batch_shape)
    alpha = jnp.broadcast_to(gg.alpha, gg.batch_shape)
    beta = jnp.broadcast_to(gg.beta, gg.batch_shape)

    def reduce_pow2_block(P, info, logZ, alpha, beta):
        while info.shape[-2] > 1:
            A = P[:n, :n]
            B = P[:n, n:]
            D = P[n:, n:]
            J_bb = D + A
            L = jnp.linalg.cholesky(J_bb)
            C = jnp.concatenate([B, B.T], axis=0)  # (2n, n)
            Kt = _tri_solve(L, C.T)  # (n, 2n)
            diag = jnp.zeros((two_n, two_n), P.dtype)
            diag = diag.at[:n, :n].set(A).at[n:, n:].set(D)
            P = diag - Kt.T @ Kt
            i1 = info[..., 0::2, :]
            i2 = info[..., 1::2, :]
            ib = i1[..., n:] + i2[..., :n]
            s = _tri_solve(L, ib[..., None])[..., 0]
            outer = jnp.concatenate(
                [i1[..., :n], i2[..., n:]], axis=-1
            )
            info = outer - s @ Kt
            alpha = alpha[..., 0::2] + alpha[..., 1::2] - 0.5 * n
            beta = (
                beta[..., 0::2]
                + beta[..., 1::2]
                - 0.5 * jnp.sum(s * s, axis=-1)
            )
            logZ = (
                logZ[..., 0::2]
                + logZ[..., 1::2]
                + 0.5 * n * math.log(2 * math.pi)
                - jnp.sum(jnp.log(jnp.diagonal(L)))
            )
        return GammaGaussian(
            logZ[..., 0],
            info[..., 0, :],
            P,
            alpha[..., 0],
            beta[..., 0],
        )

    blocks = []
    start = 0
    remaining = T
    while remaining > 0:
        size = 1 << (remaining.bit_length() - 1)
        sl = slice(start, start + size)
        blocks.append(
            reduce_pow2_block(
                P,
                info[..., sl, :],
                logZ[..., sl],
                alpha[..., sl],
                beta[..., sl],
            )
        )
        start += size
        remaining -= size
    result = blocks[0]
    for g in blocks[1:]:
        result = gamma_gaussian_tensordot(result, g, dims=n)
    return result


def sequential_gamma_gaussian_tensordot(
    gamma_gaussian: GammaGaussian,
) -> GammaGaussian:
    """Integrate a Markov product over the time batch dim in O(log T)
    pairwise rounds (ref ``distributions/hmm.py:164``
    ``_sequential_gamma_gaussian_tensordot``)."""
    assert gamma_gaussian.dim % 2 == 0
    state_dim = gamma_gaussian.dim // 2
    while gamma_gaussian.batch_shape[-1] > 1:
        time = gamma_gaussian.batch_shape[-1]
        even_time = time // 2 * 2
        even_part = gamma_gaussian[..., :even_time]
        x_y = even_part.reshape(
            gamma_gaussian.batch_shape[:-1] + (even_time // 2, 2)
        )
        x, y = x_y[..., 0], x_y[..., 1]
        contracted = gamma_gaussian_tensordot(x, y, state_dim)
        if time > even_time:
            contracted = GammaGaussian.cat(
                [contracted, gamma_gaussian[..., even_time:]], dim=-1
            )
        gamma_gaussian = contracted
    return gamma_gaussian[..., 0]
