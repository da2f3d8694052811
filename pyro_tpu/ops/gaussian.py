"""Information-form Gaussian algebra for exact sequence marginalization.

Ref ``pyro/ops/gaussian.py``: ``Gaussian:15`` (non-normalized batched
Gaussian in info form), ``AffineNormal:294``, ``gaussian_tensordot:510``,
``sequential_gaussian_tensordot:573`` (logarithmic pairwise contraction
over time), ``sequential_gaussian_filter_sample:600``.

A ``Gaussian`` represents  exp(c + i·x − ½ xᵀ P x)  with batched
``log_normalizer c``, ``info_vec i`` and ``precision P``.  All ops are
pure jnp, registered as a pytree, so Gaussians flow through
``lax.associative_scan`` — the TPU-native replacement for the reference's
Python pairwise loop: time contraction becomes O(log T) depth of batched
(2n×2n) Cholesky solves that XLA maps onto the MXU.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

from ..distributions.util import broadcast_shape
from . import linalg_small


def _bcast(L, b):
    """Broadcast the batch dims of a matrix and rhs (jax.scipy's
    solve_triangular requires identical batch ranks)."""
    batch = broadcast_shape(L.shape[:-2], b.shape[:-2])
    return (
        jnp.broadcast_to(L, batch + L.shape[-2:]),
        jnp.broadcast_to(b, batch + b.shape[-2:]),
    )


def _tri_solve(L, b):
    # unrolled substitution: 8x faster than XLA's blocked
    # triangular_solve at the small batched dims the filter algebra
    # produces (see ops/linalg_small.py header for measurements)
    L, b = _bcast(L, b)
    return linalg_small.solve_lower(L, b)


def _cholesky_solve(L, b):
    L, b = _bcast(L, b)
    return linalg_small.cholesky_solve(L, b)


@jax.tree_util.register_pytree_node_class
class Gaussian:
    """Ref ``ops/gaussian.py:15``."""

    def __init__(self, log_normalizer, info_vec, precision):
        self.log_normalizer = jnp.asarray(log_normalizer)
        self.info_vec = jnp.asarray(info_vec)
        self.precision = jnp.asarray(precision)

    def tree_flatten(self):
        return (self.log_normalizer, self.info_vec, self.precision), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.log_normalizer, obj.info_vec, obj.precision = children
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
        )

    def expand(self, batch_shape) -> "Gaussian":
        n = self.dim
        return Gaussian(
            jnp.broadcast_to(self.log_normalizer, batch_shape),
            jnp.broadcast_to(self.info_vec, tuple(batch_shape) + (n,)),
            jnp.broadcast_to(self.precision, tuple(batch_shape) + (n, n)),
        )

    def reshape(self, batch_shape) -> "Gaussian":
        n = self.dim
        return Gaussian(
            jnp.reshape(self.log_normalizer, batch_shape),
            jnp.reshape(self.info_vec, tuple(batch_shape) + (n,)),
            jnp.reshape(self.precision, tuple(batch_shape) + (n, n)),
        )

    def __getitem__(self, index) -> "Gaussian":
        """Index batch dims only (event dims are preserved)."""
        if not isinstance(index, tuple):
            index = (index,)
        return Gaussian(
            self.log_normalizer[index],
            self.info_vec[index + (slice(None),)],
            self.precision[index + (slice(None), slice(None))],
        )

    @staticmethod
    def cat(parts, dim: int = 0) -> "Gaussian":
        if dim < 0:
            dim += len(parts[0].batch_shape)
        return Gaussian(
            jnp.concatenate([p.log_normalizer for p in parts], axis=dim),
            jnp.concatenate([p.info_vec for p in parts], axis=dim),
            jnp.concatenate([p.precision for p in parts], axis=dim),
        )

    def event_pad(self, left: int = 0, right: int = 0) -> "Gaussian":
        """Pad with zeros (new dims are unconstrained) — ref ``:120``."""
        lr = (left, right)
        info_vec = jnp.pad(
            self.info_vec,
            [(0, 0)] * (self.info_vec.ndim - 1) + [lr],
        )
        precision = jnp.pad(
            self.precision,
            [(0, 0)] * (self.precision.ndim - 2) + [lr, lr],
        )
        return Gaussian(self.log_normalizer, info_vec, precision)

    def event_permute(self, perm) -> "Gaussian":
        info_vec = self.info_vec[..., perm]
        precision = self.precision[..., perm, :][..., :, perm]
        return Gaussian(self.log_normalizer, info_vec, precision)

    def __add__(self, other) -> "Gaussian":
        if isinstance(other, Gaussian):
            assert self.dim == other.dim
            return Gaussian(
                self.log_normalizer + other.log_normalizer,
                self.info_vec + other.info_vec,
                self.precision + other.precision,
            )
        # scalar/array offset to the log normalizer
        return Gaussian(
            self.log_normalizer + other, self.info_vec, self.precision
        )

    def __sub__(self, other):
        return Gaussian(
            self.log_normalizer - other, self.info_vec, self.precision
        )

    def log_density(self, value):
        """Evaluate the non-normalized log density (ref ``:196``)."""
        if self.dim == 0:
            return jnp.broadcast_to(
                self.log_normalizer,
                broadcast_shape(
                    self.log_normalizer.shape, value.shape[:-1]
                ),
            )
        Px = jnp.einsum("...ij,...j->...i", self.precision, value)
        return (
            self.log_normalizer
            + jnp.sum(value * (self.info_vec - 0.5 * Px), axis=-1)
        )

    def condition(self, value) -> "Gaussian":
        """Condition on the RIGHT-most block taking ``value`` (ref ``:147``)."""
        n_b = value.shape[-1]
        n_a = self.dim - n_b
        i_a = self.info_vec[..., :n_a]
        i_b = self.info_vec[..., n_a:]
        P_aa = self.precision[..., :n_a, :n_a]
        P_ab = self.precision[..., :n_a, n_a:]
        P_bb = self.precision[..., n_a:, n_a:]
        info_vec = i_a - jnp.einsum("...ij,...j->...i", P_ab, value)
        log_normalizer = (
            self.log_normalizer
            + jnp.sum(i_b * value, axis=-1)
            - 0.5
            * jnp.sum(
                value * jnp.einsum("...ij,...j->...i", P_bb, value), axis=-1
            )
        )
        return Gaussian(log_normalizer, info_vec, P_aa)

    def left_condition(self, value) -> "Gaussian":
        """Condition on the LEFT-most block (ref ``:170``)."""
        n_a = value.shape[-1]
        n = self.dim
        perm = jnp.concatenate(
            [jnp.arange(n_a, n), jnp.arange(n_a)]
        )
        return self.event_permute(perm).condition(value)

    def marginalize(self, left: int = 0, right: int = 0) -> "Gaussian":
        """Integrate out the left/right block exactly (ref ``:218``)."""
        if left == 0 and right == 0:
            return self
        n = self.dim
        n_b = left + right
        if left == 0:
            g = self  # already in (keep, marginalized) order: no gather
        else:
            a_idx = jnp.arange(left, n - right)
            b_idx = jnp.concatenate(
                [jnp.arange(left), jnp.arange(n - right, n)]
            )
            perm = jnp.concatenate([a_idx, b_idx])
            g = self.event_permute(perm)
        n_a = n - n_b
        P_aa = g.precision[..., :n_a, :n_a]
        P_ab = g.precision[..., :n_a, n_a:]
        P_bb = g.precision[..., n_a:, n_a:]
        i_a = g.info_vec[..., :n_a]
        i_b = g.info_vec[..., n_a:]
        L_bb = linalg_small.cholesky(P_bb)
        # P_ab P_bb^{-1} = (L^{-1} P_ba)' (L^{-1} ·)
        LinvPba = _tri_solve(L_bb, jnp.swapaxes(P_ab, -1, -2))
        Linvib = _tri_solve(L_bb, i_b[..., None])[..., 0]
        precision = P_aa - jnp.einsum(
            "...ki,...kj->...ij", LinvPba, LinvPba
        )
        info_vec = i_a - jnp.einsum(
            "...ki,...k->...i", LinvPba, Linvib
        )
        log_normalizer = (
            self.log_normalizer
            + 0.5 * n_b * math.log(2 * math.pi)
            - jnp.sum(
                jnp.log(jnp.diagonal(L_bb, axis1=-2, axis2=-1)), axis=-1
            )
            + 0.5 * jnp.sum(Linvib**2, axis=-1)
        )
        return Gaussian(log_normalizer, info_vec, precision)

    def event_logsumexp(self):
        """Integrate out ALL dims: the log normalization constant
        (ref ``:272``)."""
        n = self.dim
        L = linalg_small.cholesky(self.precision)
        Linvi = _tri_solve(L, self.info_vec[..., None])[..., 0]
        return (
            self.log_normalizer
            + 0.5 * n * math.log(2 * math.pi)
            - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
            + 0.5 * jnp.sum(Linvi**2, axis=-1)
        )

    def rsample(self, key, sample_shape=(), noise=None):
        """Sample from the normalized density (ref ``:240``).  When
        ``noise`` (standard white noise of shape
        ``sample_shape + batch_shape + (dim,)``) is given, the draw is a
        deterministic reparameterization of it and ``key`` may be None —
        pass zeros to get the mean, scaled noise for tempering, or
        ``cat([z, -z])`` for antithetic pairs (ref ``:600`` docstring)."""
        P = self.precision
        L = linalg_small.cholesky(P)
        loc = _cholesky_solve(L, self.info_vec[..., None])[..., 0]
        shape = tuple(sample_shape) + self.batch_shape + (self.dim,)
        if noise is None:
            eps = jax.random.normal(key, shape, loc.dtype)
        else:
            eps = jnp.broadcast_to(noise, shape)
        # x = loc + L^{-T} eps  so that cov = P^{-1}
        Lb = jnp.broadcast_to(L, shape + (self.dim,))
        white = linalg_small.solve_lower_t(Lb, eps[..., None])[..., 0]
        return loc + white

    def to_mvn(self):
        from ..distributions.multivariate import MultivariateNormal

        P = self.precision
        L = linalg_small.cholesky(P)
        loc = _cholesky_solve(L, self.info_vec[..., None])[..., 0]
        return MultivariateNormal(loc, precision_matrix=P)


def mvn_to_gaussian(mvn) -> Gaussian:
    """Ref ``ops/gaussian.py:328`` (also handles batched Normal)."""
    from ..distributions.continuous import Normal
    from ..distributions.distribution import Independent

    if isinstance(mvn, Independent) and isinstance(mvn.base_dist, Normal):
        base = mvn.base_dist
        scale = jnp.broadcast_to(base.scale, base.batch_shape)
        loc = jnp.broadcast_to(base.loc, base.batch_shape)
        precision_diag = scale**-2
        precision = precision_diag[..., None] * jnp.eye(
            precision_diag.shape[-1]
        )
        info_vec = loc * precision_diag
        log_normalizer = jnp.sum(
            -0.5 * math.log(2 * math.pi)
            - jnp.log(scale)
            - 0.5 * (loc / scale) ** 2,
            axis=-1,
        )
        return Gaussian(log_normalizer, info_vec, precision)
    # full MVN
    L = mvn.scale_tril
    loc = mvn.loc
    n = loc.shape[-1]
    eye = jnp.broadcast_to(jnp.eye(n, dtype=L.dtype), L.shape)
    Linv = _tri_solve(L, eye)
    precision = jnp.einsum("...ki,...kj->...ij", Linv, Linv)
    info_vec = jnp.einsum("...ij,...j->...i", precision, loc)
    log_normalizer = (
        -0.5 * n * math.log(2 * math.pi)
        - jnp.sum(jnp.log(jnp.diagonal(L, axis1=-2, axis2=-1)), axis=-1)
        - 0.5 * jnp.sum(info_vec * loc, axis=-1)
    )
    return Gaussian(log_normalizer, info_vec, precision)


def matrix_and_mvn_to_gaussian(matrix, mvn) -> Gaussian:
    """Joint Gaussian over (x, y) for  y = x @ matrix + noise,
    noise ~ mvn (ref ``ops/gaussian.py:365``).

    matrix: (..., x_dim, y_dim).
    """
    y_gaussian = mvn_to_gaussian(mvn)
    x_dim, y_dim = matrix.shape[-2:]
    P_yy = y_gaussian.precision
    i_y = y_gaussian.info_vec
    # substitute y - x A into the y-density:
    # -(1/2)(y - xA)' Pyy (y - xA) + i_y (y - xA)
    A = matrix
    P_xy = -jnp.einsum("...ij,...jk->...ik", A, P_yy)
    P_xx = jnp.einsum("...ij,...jk,...lk->...il", A, P_yy, A)
    i_x = -jnp.einsum("...ij,...j->...i", A, i_y)
    batch = broadcast_shape(
        P_xx.shape[:-2], P_yy.shape[:-2], A.shape[:-2]
    )
    top = jnp.concatenate(
        [
            jnp.broadcast_to(P_xx, batch + (x_dim, x_dim)),
            jnp.broadcast_to(P_xy, batch + (x_dim, y_dim)),
        ],
        axis=-1,
    )
    bottom = jnp.concatenate(
        [
            jnp.broadcast_to(
                jnp.swapaxes(P_xy, -1, -2), batch + (y_dim, x_dim)
            ),
            jnp.broadcast_to(P_yy, batch + (y_dim, y_dim)),
        ],
        axis=-1,
    )
    precision = jnp.concatenate([top, bottom], axis=-2)
    info_vec = jnp.concatenate(
        [
            jnp.broadcast_to(i_x, batch + (x_dim,)),
            jnp.broadcast_to(i_y, batch + (y_dim,)),
        ],
        axis=-1,
    )
    return Gaussian(
        jnp.broadcast_to(y_gaussian.log_normalizer, batch),
        info_vec,
        precision,
    )


def gaussian_tensordot(x: Gaussian, y: Gaussian, dims: int = 0) -> Gaussian:
    """Contract the last ``dims`` of x with the first ``dims`` of y
    (ref ``ops/gaussian.py:510``).

    The joint is assembled *directly* in ``(a, c, b)`` block order by
    concatenation so no event permutation (an HBM-bound gather over the
    full joint precision) is needed; ``marginalize(right=...)`` then
    eliminates the shared block in place.  On the parallel-scan HMM path
    this removes two full-matrix gathers per combine.
    """
    na = x.dim - dims
    nb = dims
    nc = y.dim - dims
    if nb == 0:
        return x.event_pad(right=nc) + y.event_pad(left=na)
    batch = jnp.broadcast_shapes(x.batch_shape, y.batch_shape)
    Px = jnp.broadcast_to(x.precision, batch + (x.dim, x.dim))
    Py = jnp.broadcast_to(y.precision, batch + (y.dim, y.dim))
    ix = jnp.broadcast_to(x.info_vec, batch + (x.dim,))
    iy = jnp.broadcast_to(y.info_vec, batch + (y.dim,))
    Paa = Px[..., :na, :na]
    Pab = Px[..., :na, na:]
    Pbb = Px[..., na:, na:] + Py[..., :nb, :nb]
    Pbc = Py[..., :nb, nb:]
    Pcc = Py[..., nb:, nb:]
    z_ac = jnp.zeros(batch + (na, nc), Px.dtype)
    row_a = jnp.concatenate([Paa, z_ac, Pab], axis=-1)
    row_c = jnp.concatenate(
        [
            jnp.swapaxes(z_ac, -1, -2),
            Pcc,
            jnp.swapaxes(Pbc, -1, -2),
        ],
        axis=-1,
    )
    row_b = jnp.concatenate(
        [jnp.swapaxes(Pab, -1, -2), Pbc, Pbb], axis=-1
    )
    precision = jnp.concatenate([row_a, row_c, row_b], axis=-2)
    info_vec = jnp.concatenate(
        [ix[..., :na], iy[..., nb:], ix[..., na:] + iy[..., :nb]],
        axis=-1,
    )
    joint = Gaussian(
        x.log_normalizer + y.log_normalizer, info_vec, precision
    )
    return joint.marginalize(right=nb)


def sequential_gaussian_tensordot_homogeneous(
    gaussian: Gaussian,
) -> Gaussian:
    """Markov-chain contraction specialized for *time-homogeneous*
    chains: every factor along the trailing time axis shares ONE
    precision matrix (only info vectors / log normalizers vary — the
    case for ``GaussianHMM.log_prob`` with time-invariant transition and
    observation parameters, where the data enters only the info side).

    Each halving level then needs a single (n x n) Cholesky and one
    shared coupling solve, with only O(T * n^2) batched vector work —
    versus the general path's batched (96 x 96)-joint eliminations.  On
    TPU this removes the dominant batched Cholesky/solve cost at the
    wide early levels.

    Requires ``gaussian.precision.ndim == 2`` (shared across batch AND
    time) and interprets the trailing batch axis as time.  Time is
    decomposed into maximal power-of-two blocks (each reduces with
    exactly-even levels, preserving homogeneity); block results are
    folded left-to-right with the general ``gaussian_tensordot``.
    """
    assert gaussian.precision.ndim == 2
    two_n = gaussian.dim
    assert two_n % 2 == 0
    n = two_n // 2
    T = gaussian.batch_shape[-1]
    P = gaussian.precision
    info = jnp.broadcast_to(
        gaussian.info_vec, gaussian.batch_shape + (two_n,)
    )
    logZ = jnp.broadcast_to(gaussian.log_normalizer, gaussian.batch_shape)

    def reduce_pow2_block(P, info, logZ):
        # info: (..., B, 2n) with B a power of two; returns shared P'
        # of the fully reduced block plus per-batch info/logZ
        while info.shape[-2] > 1:
            A = P[:n, :n]
            B = P[:n, n:]
            D = P[n:, n:]
            J_bb = D + A
            L = linalg_small.cholesky(J_bb)
            # coupling (a, c) <- b:  C = [[B], [B^T]]  (2n, n)
            C = jnp.concatenate([B, B.T], axis=0)
            Kt = _tri_solve(L, C.T)  # (n, 2n) = L^{-1} C^T
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
            logZ = (
                logZ[..., 0::2]
                + logZ[..., 1::2]
                + 0.5 * n * math.log(2 * math.pi)
                - jnp.sum(jnp.log(jnp.diagonal(L)))
                + 0.5 * jnp.sum(s * s, axis=-1)
            )
        return Gaussian(logZ[..., 0], info[..., 0, :], P)

    # decompose T into maximal power-of-two blocks, in time order
    blocks = []
    start = 0
    remaining = T
    while remaining > 0:
        size = 1 << (remaining.bit_length() - 1)
        blocks.append(
            reduce_pow2_block(
                P,
                info[..., start : start + size, :],
                logZ[..., start : start + size],
            )
        )
        start += size
        remaining -= size
    result = blocks[0]
    for g in blocks[1:]:
        result = gaussian_tensordot(result, g, dims=n)
    return result


def sequential_gaussian_tensordot(gaussian: Gaussian) -> Gaussian:
    """Integrate a Markov product of T conditionals over shared state.

    gaussian has batch ``(..., T)`` and dim ``2n`` (prev, next state);
    returns a Gaussian of dim 2n joining first and last states with the
    interior integrated out.  Ref ``ops/gaussian.py:573``: logarithmic
    pairwise halving; each round contracts adjacent pairs with one batched
    ``gaussian_tensordot`` so depth is ceil(log2 T).
    """
    assert gaussian.dim % 2 == 0
    state_dim = gaussian.dim // 2
    while gaussian.batch_shape[-1] > 1:
        time = gaussian.batch_shape[-1]
        even_time = time // 2 * 2
        even_part = gaussian[..., :even_time]
        x_y = even_part.reshape(
            gaussian.batch_shape[:-1] + (even_time // 2, 2)
        )
        x, y = x_y[..., 0], x_y[..., 1]
        contracted = gaussian_tensordot(x, y, state_dim)
        if time > even_time:
            contracted = Gaussian.cat(
                [contracted, gaussian[..., even_time:]], dim=-1
            )
        gaussian = contracted
    return gaussian[..., 0]


def _std_normal_like(key, mean):
    return jax.random.normal(key, mean.shape, mean.dtype)


def sequential_gaussian_filter_sample_homogeneous(
    init: Gaussian, trans: Gaussian, sample_shape=(), rng_key=None
):
    """Temporal-parallel posterior sampling for *time-homogeneous*
    Gaussian Markov chains (shared ``trans.precision`` across the time
    axis — the GaussianHMM posterior case, where data enters only info
    vectors).

    Divide-and-conquer (Särkkä & García-Fernández temporal
    parallelization, ref ``ops/gaussian.py:600``): time splits into
    maximal power-of-two blocks; each block's pairwise combine tree is
    built once (per level: ONE shared Cholesky + batched mid-info
    vectors), the short block chain is FFBS-sampled sequentially
    (≤ log2 T junctions), then each level's midpoints are sampled *in
    parallel* given their segment endpoints — O(log T) depth instead of
    the general path's O(T) scan.
    """
    if rng_key is None:
        rng_key = jax.random.key(0)
    assert trans.precision.ndim == 2
    two_n = trans.dim
    n = two_n // 2
    T = trans.batch_shape[-1]
    batch = trans.batch_shape[:-1]
    P0 = trans.precision
    info0 = jnp.broadcast_to(trans.info_vec, trans.batch_shape + (two_n,))
    logZ0 = jnp.broadcast_to(trans.log_normalizer, trans.batch_shape)

    def build_block(info):
        """Forward halving for one power-of-two block, saving per-level
        (L, B, ib) for the backward midpoint sampling."""
        P = P0
        levels = []
        logZ = jnp.zeros(info.shape[:-1], info.dtype)
        while info.shape[-2] > 1:
            A = P[:n, :n]
            B = P[:n, n:]
            D = P[n:, n:]
            J_bb = D + A
            L = linalg_small.cholesky(J_bb)
            C = jnp.concatenate([B, B.T], axis=0)
            Kt = _tri_solve(L, C.T)
            i1 = info[..., 0::2, :]
            i2 = info[..., 1::2, :]
            ib = i1[..., n:] + i2[..., :n]
            levels.append((L, B, ib))
            s = _tri_solve(L, ib[..., None])[..., 0]
            outer = jnp.concatenate(
                [i1[..., :n], i2[..., n:]], axis=-1
            )
            info = outer - s @ Kt
            diag = jnp.zeros((two_n, two_n), P.dtype)
            diag = diag.at[:n, :n].set(A).at[n:, n:].set(D)
            P = diag - Kt.T @ Kt
            logZ = (
                logZ[..., 0::2]
                + logZ[..., 1::2]
                + 0.5 * n * math.log(2 * math.pi)
                - jnp.sum(jnp.log(jnp.diagonal(L)))
                + 0.5 * jnp.sum(s * s, axis=-1)
            )
        g = Gaussian(logZ[..., 0], info[..., 0, :], P)
        return g, levels

    # decompose T into power-of-two blocks in time order
    blocks = []
    start = 0
    remaining = T
    while remaining > 0:
        size = 1 << (remaining.bit_length() - 1)
        g, levels = build_block(info0[..., start : start + size, :])
        blocks.append((size, g, levels))
        start += size
        remaining -= size

    # FFBS over the short block chain to sample the junction states
    alphas = [init.expand(batch)]
    for size, g, _levels in blocks:
        joint = g + alphas[-1].event_pad(right=n)
        alphas.append(joint.marginalize(left=n))
    k_top, k_levels = jax.random.split(rng_key)
    keys = jax.random.split(k_top, len(blocks) + 1)
    z_end = alphas[-1].rsample(keys[0], sample_shape)
    junctions = [z_end]  # time-reversed junction states
    for j in range(len(blocks) - 1, -1, -1):
        size, g, _levels = blocks[j]
        posterior = g.condition(junctions[-1]) + alphas[j]
        junctions.append(posterior.rsample(keys[j + 1]))
    junctions.reverse()  # junctions[j] = state at the START of block j

    # parallel in-block midpoint descent
    all_level_keys = jax.random.split(k_levels, max(1, len(blocks)))
    out_chunks = []  # per block: states at the block's interior+start
    for j, (size, g, levels) in enumerate(blocks):
        z_pts = jnp.stack(
            [junctions[j], junctions[j + 1]], axis=-2
        )  # (..., 2, n)
        lvl_keys = jax.random.split(all_level_keys[j], max(1, len(levels)))
        for li in range(len(levels) - 1, -1, -1):
            L, B, ib = levels[li]
            z_a = z_pts[..., :-1, :]
            z_c = z_pts[..., 1:, :]
            info_cond = ib - z_a @ B - z_c @ B.T
            # solve J_bb m = info_cond;  noise = L^{-T} eps
            m = _cholesky_solve(L, info_cond[..., None])[..., 0]
            eps = _std_normal_like(lvl_keys[li], m)
            Lb, epsb = _bcast(L, eps[..., None])
            noise = linalg_small.solve_lower_t(Lb, epsb)[..., 0]
            z_mid = m + noise
            # interleave points and midpoints
            stacked = jnp.concatenate(
                [z_a[..., None, :], z_mid[..., None, :]], axis=-2
            )
            new_shape = stacked.shape[:-3] + (
                stacked.shape[-3] * 2,
                n,
            )
            z_pts = jnp.concatenate(
                [stacked.reshape(new_shape), z_pts[..., -1:, :]],
                axis=-2,
            )
        out_chunks.append(z_pts[..., :-1, :])
    out_chunks.append(junctions[-1][..., None, :])
    return jnp.concatenate(out_chunks, axis=-2)


def sequential_gaussian_filter_sample(
    init: Gaussian, trans: Gaussian, sample_shape=(), rng_key=None, noise=None
):
    """Forward-filter backward-sample for a Gaussian Markov chain, in
    O(log T) parallel depth, valid for *time-varying* transitions.

    ``noise``, if given, is a standard-white-noise tensor of shape
    ``sample_shape + batch + (T + 1, n)`` consumed deterministically
    (blockwise, in sampling order) — zeros yield the exact posterior
    mean, and the output is a linear function of ``noise`` whose
    Jacobian reproduces the posterior covariance (used by the exact
    equality tests).

    ``init`` is over the initial state (dim n); ``trans`` has batch
    (..., T) over (prev, next).  Returns samples of shape
    sample_shape + batch + (T+1, n).

    Same tree algorithm as the reference (``ops/gaussian.py:600``),
    written for XLA: a forward pairwise-halving pass contracts adjacent
    transition factors (keeping, at each level, the 3n-dim joint in
    (left, right, mid) block order PLUS the mid-block Cholesky factor on
    a tape), then a backward pass samples the chain endpoints from the
    fully contracted Gaussian and descends the tape, conditioning each
    level's joints on already-sampled neighbor pairs to draw all
    midpoints of that level *in one batched op* — reusing the taped
    factorization, since conditioning leaves the mid precision
    unchanged.  No event permutation (a double gather over the (3n, 3n)
    precisions) appears anywhere on the path.
    Every level is a fully batched Cholesky/solve with static shapes, so
    depth is ceil(log2 T) regardless of whether ``trans`` is
    heterogeneous.  (The homogeneous specialization
    ``sequential_gaussian_filter_sample_homogeneous`` additionally
    shares one factorization per level.)
    """
    if rng_key is None and noise is None:
        rng_key = jax.random.key(0)
    n = init.dim
    assert trans.dim == 2 * n
    T = trans.batch_shape[-1]
    batch = broadcast_shape(trans.batch_shape[:-1], init.batch_shape)
    init = init.expand(batch)
    if T == 0:
        z0 = init.rsample(
            rng_key,
            sample_shape,
            noise=None if noise is None else noise[..., 0, :],
        )
        return z0[..., None, :]
    noise_pos = 0

    def _take_noise(k):
        """Consume the next k time-slots of the provided noise buffer."""
        nonlocal noise_pos
        block = noise[..., noise_pos : noise_pos + k, :]
        noise_pos += k
        return block
    trans = trans.expand(batch + (T,))

    # Forward: pairwise halving.  Each level's pair joint is assembled
    # DIRECTLY in (left, right, mid) block order by concatenation — no
    # event_permute (a double gather over the full (3n, 3n) precision,
    # measured as the dominant per-level HBM traffic at T=4000) — and
    # the mid block is integrated out in place (marginalize's left==0
    # fast path).  The tape keeps, per level, the (l, r, m) joint AND
    # the mid-block Cholesky factor computed by the marginalization:
    # conditioning on (l, r) does not change the mid precision, so the
    # backward midpoint draws reuse it instead of refactorizing.
    tape = []
    g = trans
    while g.batch_shape[-1] > 1:
        time = g.batch_shape[-1]
        even_time = time // 2 * 2
        x_y = g[..., :even_time].reshape(batch + (even_time // 2, 2))
        x, y = x_y[..., 0], x_y[..., 1]
        # x is over (l, m), y over (m, r); joint over (l, r, m)
        Px, Py = x.precision, y.precision
        z_lr = jnp.zeros(Px.shape[:-2] + (n, n), Px.dtype)
        row_l = jnp.concatenate(
            [Px[..., :n, :n], z_lr, Px[..., :n, n:]], axis=-1
        )
        row_r = jnp.concatenate(
            [z_lr, Py[..., n:, n:], jnp.swapaxes(Py[..., :n, n:], -1, -2)],
            axis=-1,
        )
        row_m = jnp.concatenate(
            [
                jnp.swapaxes(Px[..., :n, n:], -1, -2),
                Py[..., :n, n:],
                Px[..., n:, n:] + Py[..., :n, :n],
            ],
            axis=-1,
        )
        precision = jnp.concatenate([row_l, row_r, row_m], axis=-2)
        info_vec = jnp.concatenate(
            [
                x.info_vec[..., :n],
                y.info_vec[..., n:],
                x.info_vec[..., n:] + y.info_vec[..., :n],
            ],
            axis=-1,
        )
        joint = Gaussian(
            x.log_normalizer + y.log_normalizer, info_vec, precision
        )
        # marginalize the (rightmost) mid block, keeping its Cholesky
        P_kk = precision[..., : 2 * n, : 2 * n]
        P_km = precision[..., : 2 * n, 2 * n :]
        P_mm = precision[..., 2 * n :, 2 * n :]
        i_k = info_vec[..., : 2 * n]
        i_m = info_vec[..., 2 * n :]
        L_mm = linalg_small.cholesky(P_mm)
        LinvPmk = _tri_solve(L_mm, jnp.swapaxes(P_km, -1, -2))
        Linvim = _tri_solve(L_mm, i_m[..., None])[..., 0]
        contracted = Gaussian(
            joint.log_normalizer
            + 0.5 * n * math.log(2 * math.pi)
            - jnp.sum(
                jnp.log(jnp.diagonal(L_mm, axis1=-2, axis2=-1)), axis=-1
            )
            + 0.5 * jnp.sum(Linvim**2, axis=-1),
            i_k - jnp.einsum("...ki,...k->...i", LinvPmk, Linvim),
            P_kk - jnp.einsum("...ki,...kj->...ij", LinvPmk, LinvPmk),
        )
        tape.append((joint, L_mm))
        if time > even_time:
            contracted = Gaussian.cat(
                [contracted, g[..., even_time:]], dim=-1
            )
        g = contracted
    g = g[..., 0] + init.event_pad(right=n)  # joint over (z_0, z_T)

    # Backward: sample endpoints, then per-level batched midpoints.
    if rng_key is not None:
        keys = jax.random.split(rng_key, len(tape) + 1)
    else:  # noise-driven: rsample ignores keys
        keys = [None] * (len(tape) + 1)
    shape = tuple(sample_shape) + batch
    end_noise = (
        None
        if noise is None
        else _take_noise(2).reshape(shape + (2 * n,))
    )
    result = g.rsample(keys[0], sample_shape, noise=end_noise).reshape(
        shape + (2, n)
    )
    for level in range(len(tape) - 1, -1, -1):
        joint, L_mm = tape[level]
        m = result.shape[-2]
        if joint.batch_shape[-1] == m - 1:  # even level
            left = result[..., :-1, :]
            right = result[..., 1:, :]
            keep_tail = result[..., -1:, :]
        else:  # odd level: the last point was carried through unpaired
            assert joint.batch_shape[-1] == m - 2
            left = result[..., :-2, :]
            right = result[..., 1:-1, :]
            keep_tail = result[..., -2:, :]
        cond = jnp.concatenate([left, right], axis=-1)
        mid_noise = None if noise is None else _take_noise(cond.shape[-2])
        # conditional mid draw, reusing the forward's mid Cholesky:
        # p(m | l, r) has precision P_mm (unchanged by conditioning) and
        # info i_m - P_m,(l,r) @ (l, r); joint layout is (l, r, m)
        P_mk = joint.precision[..., 2 * n :, : 2 * n]
        i_m = joint.info_vec[..., 2 * n :]
        info_c = i_m - jnp.einsum("...ij,...j->...i", P_mk, cond)
        loc = _cholesky_solve(L_mm, info_c[..., None])[..., 0]
        draw_shape = loc.shape
        if mid_noise is not None:
            eps = jnp.broadcast_to(mid_noise, draw_shape)
        else:
            eps = jax.random.normal(
                keys[level + 1], draw_shape, loc.dtype
            )
        Lb = jnp.broadcast_to(L_mm, draw_shape + (n,))
        mids = loc + linalg_small.solve_lower_t(Lb, eps[..., None])[..., 0]
        pairs = jnp.stack([left, mids], axis=-2)
        interleaved = pairs.reshape(
            pairs.shape[:-3] + (2 * pairs.shape[-3], n)
        )
        kt = jnp.broadcast_to(
            keep_tail, interleaved.shape[:-2] + keep_tail.shape[-2:]
        )
        result = jnp.concatenate([interleaved, kt], axis=-2)
    assert noise is None or noise_pos == T + 1, "noise not fully consumed"
    return result


def sequential_gaussian_filter_sample_sequential(
    init: Gaussian, trans: Gaussian, sample_shape=(), rng_key=None
):
    """O(T) scan-based forward-filter backward-sample; retained as the
    ground truth for distribution-equality tests of the O(log T) tree
    path (``sequential_gaussian_filter_sample``) and for very small T
    where tree bookkeeping doesn't pay.
    """
    if rng_key is None:
        rng_key = jax.random.key(0)
    n = init.dim
    T = trans.batch_shape[-1]
    batch = trans.batch_shape[:-1]

    # forward filtering: alpha_t(z_t) ∝ p(z_t, y_{1:t});
    # carry alpha as (log_normalizer, info_vec, precision) over n dims
    def fwd(alpha, tr):
        # joint over (z_t, z_{t+1}), then marginalize z_t (left block)
        joint = tr + alpha.event_pad(right=n)
        new_alpha = joint.marginalize(left=n)
        return new_alpha, alpha

    # move time axis to the front for scan
    trans_t = jax.tree.map(
        lambda x: jnp.moveaxis(x, len(batch), 0), trans
    )
    alpha_T, alphas = jax.lax.scan(fwd, init.expand(batch), trans_t)

    # backward sampling: z_T ~ alpha_T; z_t | z_{t+1} ~ alpha_t(z_t) *
    # trans_t(z_t, z_{t+1})
    key_T, key_rest = jax.random.split(rng_key)
    z_T = alpha_T.rsample(key_T, sample_shape)
    keys = jax.random.split(key_rest, T)

    def bwd(z_next, inputs):
        alpha_t, tr_t, key = inputs
        # condition trans on z_{t+1} (the right block), multiply by alpha
        cond = tr_t.condition(z_next)
        posterior = Gaussian(
            cond.log_normalizer + alpha_t.log_normalizer,
            cond.info_vec + alpha_t.info_vec,
            cond.precision + alpha_t.precision,
        )
        z_t = posterior.rsample(key)
        return z_t, z_next

    # the scan output at index t is z_{t+1}; the final carry is z_0
    z_0, zs = jax.lax.scan(bwd, z_T, (alphas, trans_t, keys), reverse=True)
    seq = jnp.concatenate(
        [z_0[..., None, :], jnp.moveaxis(zs, 0, -2)], axis=-2
    )
    return seq
