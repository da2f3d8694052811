"""State-space representations of Matern GP kernels.

Ref ``pyro/ops/ssm_gp.py`` (MaternKernel): a Matern-nu GP in 1-D time is a
linear-Gaussian SSM of dim nu+1/2; these helpers return the discrete-time
transition matrix and process covariance over a step ``dt``, plus the
stationary covariance.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..distributions import constraints


class MaternKernel:
    """Ref ``ssm_gp.py:MaternKernel``: nu in {0.5, 1.5, 2.5}; parameters
    are arrays of shape (num_gps,)."""

    def __init__(self, nu: float, num_gps: int, length_scale_init=None, kernel_scale_init=None):
        assert nu in (0.5, 1.5, 2.5)
        self.nu = nu
        self.num_gps = num_gps
        self.state_dim = {0.5: 1, 1.5: 2, 2.5: 3}[nu]
        if length_scale_init is None:
            length_scale_init = jnp.ones(num_gps)
        if kernel_scale_init is None:
            kernel_scale_init = jnp.ones(num_gps)
        self.length_scale_init = length_scale_init
        self.kernel_scale_init = kernel_scale_init

    def stationary_covariance(self, length_scale, kernel_scale):
        """(num_gps, state_dim, state_dim)."""
        s2 = kernel_scale**2
        if self.nu == 0.5:
            return s2[:, None, None] * jnp.ones(
                (self.num_gps, 1, 1)
            )
        if self.nu == 1.5:
            lam = math.sqrt(3.0) / length_scale
            P = jnp.zeros((self.num_gps, 2, 2))
            P = P.at[:, 0, 0].set(s2)
            P = P.at[:, 1, 1].set(s2 * lam**2)
            return P
        lam = math.sqrt(5.0) / length_scale
        P = jnp.zeros((self.num_gps, 3, 3))
        P = P.at[:, 0, 0].set(s2)
        P = P.at[:, 0, 2].set(-s2 * lam**2 / 3.0)
        P = P.at[:, 2, 0].set(-s2 * lam**2 / 3.0)
        P = P.at[:, 1, 1].set(s2 * lam**2 / 3.0)
        P = P.at[:, 2, 2].set(s2 * lam**4)
        return P

    def transition_matrix(self, length_scale, dt):
        """exp(F dt) per GP: (num_gps, state_dim, state_dim)."""
        if self.nu == 0.5:
            lam = 1.0 / length_scale
            return jnp.exp(-lam * dt)[:, None, None]
        if self.nu == 1.5:
            lam = math.sqrt(3.0) / length_scale
            e = jnp.exp(-lam * dt)
            A = jnp.zeros((self.num_gps, 2, 2))
            A = A.at[:, 0, 0].set(e * (1 + lam * dt))
            A = A.at[:, 0, 1].set(e * dt)
            A = A.at[:, 1, 0].set(-e * lam**2 * dt)
            A = A.at[:, 1, 1].set(e * (1 - lam * dt))
            return A
        lam = math.sqrt(5.0) / length_scale
        e = jnp.exp(-lam * dt)
        ld = lam * dt
        A = jnp.zeros((self.num_gps, 3, 3))
        A = A.at[:, 0, 0].set(e * (1 + ld + 0.5 * ld**2))
        A = A.at[:, 0, 1].set(e * dt * (1 + ld))
        A = A.at[:, 0, 2].set(e * 0.5 * dt**2)
        A = A.at[:, 1, 0].set(e * (-0.5 * lam**3 * dt**2))
        A = A.at[:, 1, 1].set(e * (1 + ld - ld**2))
        A = A.at[:, 1, 2].set(e * dt * (1 - 0.5 * ld))
        A = A.at[:, 2, 0].set(e * (0.5 * lam**4 * dt**2 - lam**3 * dt))
        A = A.at[:, 2, 1].set(e * (lam**3 * dt**2 - 3 * lam**2 * dt))
        A = A.at[:, 2, 2].set(e * (1 - 2 * ld + 0.5 * ld**2))
        return A

    def transition_matrix_and_covariance(self, length_scale, kernel_scale, dt):
        """(A, Q) with Q = P - A P Aᵀ (stationarity)."""
        A = self.transition_matrix(length_scale, dt)
        P = self.stationary_covariance(length_scale, kernel_scale)
        Q = P - A @ P @ jnp.swapaxes(A, -1, -2)
        # symmetrize + jitter for Cholesky robustness
        Q = 0.5 * (Q + jnp.swapaxes(Q, -1, -2))
        Q = Q + 1e-6 * jnp.eye(self.state_dim)
        return A, Q
