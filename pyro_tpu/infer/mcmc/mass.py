"""Structured mass-matrix adapters for HMC/NUTS.

Ref ``pyro/infer/mcmc/adaptation.py``: ``BlockMassMatrix:238`` and
``ArrowheadMassMatrix:395``.  The reference keys blocks by tuples of site
names; in this framework HMC states are flat unconstrained vectors, so
the adapters here operate on flat vectors: the arrowhead head covers the
first ``head_size`` coordinates densely and the tail is diagonal.  All
kinetic-energy algebra stays O(N * head_size^2) via the triangular
arrowhead ops in ``pyro_tpu.ops.arrowhead``.
"""

from __future__ import annotations

import jax.numpy as jnp

from ...ops.arrowhead import (
    SymmArrowhead,
    TriuArrowhead,
    sqrt as arrowhead_sqrt,
    triu_gram,
    triu_inverse,
    triu_matvecmul,
)
from ...ops.welford import welford_covariance, welford_init, welford_update


class BlockMassMatrix:
    """Dense-or-diagonal mass matrix with Welford adaptation on a flat
    vector (ref ``adaptation.py:238``)."""

    def __init__(self, init_scale: float = 1.0):
        self._init_scale = init_scale
        self._adapt_scheme = None
        self.inverse_mass_matrix = None
        self._sqrt = None  # upper-triangular sqrt of the mass matrix
        self._sqrt_inverse = None

    def configure(self, size: int, diagonal: bool = True, adapt_mass_matrix=True):
        self._diagonal = diagonal
        init = (
            jnp.full((size,), self._init_scale)
            if diagonal
            else jnp.eye(size) * self._init_scale
        )
        self._set_inverse_mass_matrix(init)
        if adapt_mass_matrix:
            self._adapt_scheme = welford_init(size, diagonal=diagonal)

    def _set_inverse_mass_matrix(self, inv_m):
        self.inverse_mass_matrix = inv_m
        if inv_m.ndim == 1:
            self._sqrt = 1.0 / jnp.sqrt(inv_m)
            self._sqrt_inverse = jnp.sqrt(inv_m)
        else:
            sqrt_inv = jnp.linalg.cholesky(inv_m).T  # upper
            self._sqrt_inverse = sqrt_inv
            self._sqrt = jnp.linalg.inv(sqrt_inv)

    def update(self, z_flat, z_grad_flat=None):
        self._adapt_scheme = welford_update(self._adapt_scheme, z_flat)

    def end_adaptation(self):
        cov = welford_covariance(self._adapt_scheme, regularize=True)
        self._set_inverse_mass_matrix(cov)

    def kinetic_grad(self, r_flat):
        if self.inverse_mass_matrix.ndim == 1:
            return self.inverse_mass_matrix * r_flat
        return self.inverse_mass_matrix @ r_flat

    def scale(self, r_unscaled):
        """M^{1/2} @ r_unscaled."""
        if self.inverse_mass_matrix.ndim == 1:
            return self._sqrt * r_unscaled
        return self._sqrt @ r_unscaled

    def unscale(self, r_flat):
        """M^{-1/2} @ r."""
        if self.inverse_mass_matrix.ndim == 1:
            return self._sqrt_inverse * r_flat
        return self._sqrt_inverse @ r_flat


class ArrowheadMassMatrix:
    """Arrowhead-structured mass matrix: dense head (the coordinates a
    user lists in ``full_mass``), diagonal tail (ref
    ``adaptation.py:395``).  The mass matrix (not its inverse) is adapted
    from the Welford covariance of *gradients*, following the reference."""

    def __init__(self, init_scale: float = 1.0, head_size: int = 0):
        self._init_scale = init_scale
        self.head_size = head_size
        self._adapt_scheme = None
        self._sqrt = None
        self._sqrt_inverse = None

    def configure(self, size: int, adapt_mass_matrix: bool = True):
        self._size = size
        head = self.head_size
        top = jnp.concatenate(
            [
                jnp.eye(head) / self._init_scale,
                jnp.zeros((head, size - head)),
            ],
            -1,
        )
        bottom = jnp.full((size - head,), 1.0 / self._init_scale)
        self._set_mass_matrix(SymmArrowhead(top, bottom))
        if adapt_mass_matrix:
            # dense stats over the head block, diagonal over the tail
            self._adapt_head = welford_init(self.head_size, diagonal=False)
            self._adapt_all = welford_init(size, diagonal=True)

    def _set_mass_matrix(self, m: SymmArrowhead):
        self.mass_matrix = m
        self._sqrt = arrowhead_sqrt(m)
        self._sqrt_inverse = triu_inverse(self._sqrt)

    @property
    def inverse_mass_matrix(self):
        """O(N^2 head) — for testing only; the kernel algebra never needs
        the full inverse (ref :431-443)."""
        return triu_gram(self._sqrt_inverse)

    def update(self, z_flat, z_grad_flat):
        self._adapt_head = welford_update(
            self._adapt_head, z_grad_flat[: self.head_size]
        )
        self._adapt_all = welford_update(self._adapt_all, z_grad_flat)

    def end_adaptation(self):
        head = self.head_size
        # gradient covariance approximates the precision of z, i.e. the
        # mass matrix (ref adaptation.py ArrowheadMassMatrix.update docs)
        head_cov = welford_covariance(self._adapt_head, regularize=True)
        all_var = welford_covariance(self._adapt_all, regularize=True)
        cross = jnp.zeros((head, self._size - head))
        top = jnp.concatenate([head_cov, cross], -1)
        self._set_mass_matrix(SymmArrowhead(top, all_var[head:]))

    def kinetic_grad(self, r_flat):
        """v = M^{-1} r = sqrt_inv @ (sqrt_inv^T @ ... ) using triangular
        matvecs — O(N * head_size)."""
        u = triu_matvecmul(self._sqrt_inverse, r_flat, transpose=False)
        return triu_matvecmul(self._sqrt_inverse, u, transpose=True)

    def scale(self, r_unscaled):
        """M^{1/2} @ r_unscaled (ref :536: a plain triangular matvec)."""
        return triu_matvecmul(self._sqrt, r_unscaled, transpose=False)

    def unscale(self, r_flat):
        """M^{-1/2} @ r."""
        return triu_matvecmul(self._sqrt_inverse, r_flat, transpose=False)
