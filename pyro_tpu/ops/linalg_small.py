"""Unrolled batched linear algebra for SMALL matrices on TPU.

XLA lowers ``cholesky``/``triangular_solve`` to blocked algorithms with
sequential while-loops that schedule poorly for large batches of small
matrices — exactly the shape class the Gaussian filter algebra produces
(thousands of (n..3n)-dim joints per tree level, n = hidden dim).
Measured on v5e at (2000, 48, 48), in-program (scan-chained, dispatch
excluded): XLA cholesky 11.77 ms vs this unrolled column recurrence
1.43 ms — 8.2x.  The unrolled form is a Python loop over n columns of
fully-batched vector ops, so XLA sees a straight-line fused graph.

Above ``_UNROLL_MAX_DIM`` these fall back to the library primitives
(the blocked algorithms win asymptotically, and unrolling would bloat
the program).  All functions are plain jnp graphs, so autodiff works
through them (the Gaussian HMM log_prob is differentiated in training).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_UNROLL_MAX_DIM = 128


def cholesky(A):
    """Batched lower Cholesky; unrolled Cholesky-Banachiewicz columns
    for dims <= _UNROLL_MAX_DIM, else ``jnp.linalg.cholesky``."""
    n = A.shape[-1]
    if n > _UNROLL_MAX_DIM:
        return jnp.linalg.cholesky(A)
    L = jnp.zeros_like(A)
    rows = jnp.arange(n)
    for j in range(n):
        if j:
            # s[..., i] = sum_{k<j} L[..., i, k] * L[..., j, k]
            s = jnp.einsum(
                "...ik,...k->...i", L[..., :, :j], L[..., j, :j]
            )
        else:
            s = jnp.zeros_like(A[..., :, 0])
        d = jnp.sqrt(A[..., j, j] - s[..., j])
        col = (A[..., :, j] - s) / d[..., None]
        L = L.at[..., :, j].set(jnp.where(rows >= j, col, 0.0))
    return L


def solve_lower(L, B):
    """Solve L x = B (L lower-triangular, B (..., n, m)) by unrolled
    forward substitution with rank-1 residual updates."""
    n = L.shape[-1]
    if n > _UNROLL_MAX_DIM:
        return jax.scipy.linalg.solve_triangular(L, B, lower=True)
    R = B
    xs = []
    for j in range(n):
        xj = R[..., j, :] / L[..., j, j, None]
        xs.append(xj)
        if j + 1 < n:
            R = R - L[..., :, j, None] * xj[..., None, :]
    return jnp.stack(xs, axis=-2)


def solve_lower_t(L, B):
    """Solve L^T x = B by unrolled backward substitution (column j of
    L^T is row j of L)."""
    n = L.shape[-1]
    if n > _UNROLL_MAX_DIM:
        return jax.scipy.linalg.solve_triangular(
            jnp.swapaxes(L, -1, -2), B, lower=False
        )
    R = B
    xs = [None] * n
    for j in range(n - 1, -1, -1):
        xj = R[..., j, :] / L[..., j, j, None]
        xs[j] = xj
        if j:
            R = R - L[..., j, :, None] * xj[..., None, :]
    return jnp.stack(xs, axis=-2)


def cholesky_solve(L, B):
    """Solve (L L^T) x = B given the lower Cholesky factor."""
    return solve_lower_t(L, solve_lower(L, B))
