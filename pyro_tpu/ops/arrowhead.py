"""Symmetric-arrowhead matrix utilities for structured HMC mass matrices.

Ref ``pyro/ops/arrowhead.py``: an arrowhead mass matrix stores a dense
``head_size x N`` top block plus a diagonal tail, so matvecs and square
roots are O(N * head_size^2) instead of O(N^3) — a middle ground between
diagonal and dense mass adaptation for high-dimensional HMC.

The Cholesky-retry loop of the reference becomes a fixed-trip
``lax.while_loop``-free Python loop over halved tails (cheap: the trip
count is static and small), keeping everything jittable.
"""

from __future__ import annotations

from collections import namedtuple

import jax.numpy as jnp
import jax.scipy.linalg

SymmArrowhead = namedtuple("SymmArrowhead", ["top", "bottom_diag"])
TriuArrowhead = namedtuple("TriuArrowhead", ["top", "bottom_diag"])


def sqrt(x: SymmArrowhead) -> TriuArrowhead:
    """Upper-triangular square root of a symmetric arrowhead matrix
    (ref ``arrowhead.py:12``)."""
    assert isinstance(x, SymmArrowhead)
    head_size = x.top.shape[0]
    if head_size == 0:
        return TriuArrowhead(x.top, jnp.sqrt(x.bottom_diag))

    A, B = x.top[:, :head_size], x.top[:, head_size:]
    Dsqrt = jnp.sqrt(x.bottom_diag)

    # jnp.linalg.cholesky returns NaN (not an exception) on failure, so
    # the reference's retry loop becomes a select over halved tails.
    top_left = None
    for _ in range(6):
        B_Dsqrt = B / Dsqrt[None, :]
        schur_complement = A - B_Dsqrt @ B_Dsqrt.T
        candidate = jnp.flip(
            jnp.linalg.cholesky(jnp.flip(schur_complement, (-2, -1))),
            (-2, -1),
        )
        ok = jnp.all(jnp.isfinite(candidate))
        if top_left is None:
            top_left = candidate
            ok_so_far = ok
            B_kept = B_Dsqrt
        else:
            top_left = jnp.where(ok_so_far, top_left, candidate)
            B_kept = jnp.where(ok_so_far, B_kept, B_Dsqrt)
            ok_so_far = ok_so_far | ok
        B = B / 2
    top = jnp.concatenate([top_left, B_kept], -1)
    return TriuArrowhead(top, Dsqrt)


def triu_inverse(x: TriuArrowhead) -> TriuArrowhead:
    """Inverse of an upper-triangular arrowhead matrix (ref :61)."""
    assert isinstance(x, TriuArrowhead)
    head_size = x.top.shape[0]
    if head_size == 0:
        return TriuArrowhead(x.top, 1.0 / x.bottom_diag)

    A, B = x.top[:, :head_size], x.top[:, head_size:]
    B_Dinv = B / x.bottom_diag[None, :]
    identity = jnp.eye(head_size, dtype=A.dtype)
    top_left = jax.scipy.linalg.solve_triangular(A, identity, lower=False)
    top_right = -top_left @ B_Dinv
    top = jnp.concatenate([top_left, top_right], -1)
    return TriuArrowhead(top, 1.0 / x.bottom_diag)


def triu_matvecmul(x: TriuArrowhead, y, transpose: bool = False):
    """Matvec with an upper-triangular arrowhead matrix, O(N * head_size)
    (ref :85)."""
    assert isinstance(x, TriuArrowhead)
    head_size = x.top.shape[0]
    if transpose:
        z = x.top.T @ y[:head_size]
        top = z[:head_size]
        bottom = z[head_size:] + x.bottom_diag * y[head_size:]
    else:
        top = x.top @ y
        bottom = x.bottom_diag * y[head_size:]
    return jnp.concatenate([top, bottom], 0)


def triu_gram(x: TriuArrowhead):
    """Gram matrix ``x.T @ x`` of an upper-triangular arrowhead matrix
    (ref :108)."""
    assert isinstance(x, TriuArrowhead)
    head_size = x.top.shape[0]
    if head_size == 0:
        return x.bottom_diag**2

    A, B = x.top[:, :head_size], x.top[:, head_size:]
    top = A.T @ x.top
    bottom_left = top[:, head_size:].T
    bottom_right = B.T @ B + jnp.diag(x.bottom_diag**2)
    return jnp.concatenate(
        [top, jnp.concatenate([bottom_left, bottom_right], -1)], 0
    )
