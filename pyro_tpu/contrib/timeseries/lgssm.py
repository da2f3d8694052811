"""Generic learnable linear-Gaussian SSM (ref
``pyro/contrib/timeseries/lgssm.py:14``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist
from ...distributions import constraints
from .base import TimeSeriesModel


class GenericLGSSM(TimeSeriesModel):
    def __init__(
        self,
        obs_dim: int = 1,
        state_dim: int = 2,
        obs_noise_scale_init=None,
        learnable_observation_loc: bool = False,
        name=None,
    ):
        super().__init__(name)
        self.obs_dim = obs_dim
        self.state_dim = state_dim
        key = jax.random.key(3)
        self._register_param(
            "trans_matrix",
            jnp.eye(state_dim)
            + 0.03 * jax.random.normal(key, (state_dim, state_dim)),
        )
        self._register_param(
            "trans_noise_scale_sq",
            0.1 * jnp.ones(state_dim),
            constraints.positive,
        )
        self._register_param(
            "obs_matrix",
            0.3
            * jax.random.normal(
                jax.random.fold_in(key, 1), (state_dim, obs_dim)
            ),
        )
        self._register_param(
            "obs_noise_scale",
            obs_noise_scale_init
            if obs_noise_scale_init is not None
            else 0.2 * jnp.ones(obs_dim),
            constraints.positive,
        )
        self._register_param(
            "init_noise_scale_sq",
            jnp.ones(state_dim),
            constraints.positive,
        )
        self.learnable_observation_loc = learnable_observation_loc
        if learnable_observation_loc:
            self._register_param("obs_loc", jnp.zeros(obs_dim))

    def get_dist(self, duration=None):
        init = dist.MultivariateNormal(
            jnp.zeros(self.state_dim),
            covariance_matrix=jnp.diag(self.init_noise_scale_sq),
        )
        trans = dist.MultivariateNormal(
            jnp.zeros((1, self.state_dim)),
            covariance_matrix=jnp.diag(self.trans_noise_scale_sq)[None],
        )
        obs_loc = (
            self.obs_loc
            if self.learnable_observation_loc
            else jnp.zeros(self.obs_dim)
        )
        obs_noise = dist.Normal(
            obs_loc[None], self.obs_noise_scale[None]
        ).to_event(1)
        return dist.GaussianHMM(
            init,
            self.trans_matrix[None],
            trans,
            self.obs_matrix[None],
            obs_noise,
            duration=duration,
        )

    def log_prob(self, targets):
        return self.get_dist(duration=targets.shape[0]).log_prob(targets)

    def forecast(self, targets, N_timesteps: int):
        """Posterior-predictive mean/cov rollout (ref ``lgssm.py:forecast``)."""
        filtered = self.get_dist(duration=targets.shape[0]).filter(targets)
        loc = filtered.loc
        cov = filtered.covariance_matrix
        locs, covs = [], []
        A = self.trans_matrix
        Q = jnp.diag(self.trans_noise_scale_sq)
        H = self.obs_matrix
        R = jnp.diag(self.obs_noise_scale**2)
        for _ in range(N_timesteps):
            loc = loc @ A
            cov = A.T @ cov @ A + Q
            locs.append(loc @ H)
            covs.append(H.T @ cov @ H + R)
        return dist.MultivariateNormal(
            jnp.stack(locs), covariance_matrix=jnp.stack(covs)
        )


class GenericLGSSMWithGPNoiseModel(TimeSeriesModel):
    """LGSSM whose outputs are additionally corrupted by per-output Matern
    GP noise (ref ``lgssmgp.py:15``):

        y_i(t) = sum_j A_ij z_j(t) + f_i(t) + eps_i(t)

    The GP states are stacked with the z-states into one GaussianHMM, so
    training stays O(log T).
    """

    def __init__(
        self,
        obs_dim: int = 1,
        state_dim: int = 2,
        nu: float = 1.5,
        obs_noise_scale_init=None,
        length_scale_init=None,
        kernel_scale_init=None,
        learnable_observation_loc: bool = False,
        name=None,
    ):
        from ...ops.ssm_gp import MaternKernel

        super().__init__(name)
        self.obs_dim = obs_dim
        self.state_dim = state_dim
        self.nu = nu
        self.kernel = MaternKernel(nu, obs_dim)
        self.gp_state_dim = self.kernel.state_dim * obs_dim
        self.full_state_dim = self.gp_state_dim + state_dim
        self.dt = 1.0

        key = jax.random.key(7)
        self._register_param(
            "length_scale",
            length_scale_init
            if length_scale_init is not None
            else jnp.ones(obs_dim),
            constraints.positive,
        )
        self._register_param(
            "kernel_scale",
            kernel_scale_init
            if kernel_scale_init is not None
            else jnp.ones(obs_dim),
            constraints.positive,
        )
        self._register_param(
            "obs_noise_scale",
            obs_noise_scale_init
            if obs_noise_scale_init is not None
            else 0.2 * jnp.ones(obs_dim),
            constraints.positive,
        )
        self._register_param(
            "z_trans_matrix",
            jnp.eye(state_dim)
            + 0.03 * jax.random.normal(key, (state_dim, state_dim)),
        )
        self._register_param(
            "z_obs_matrix",
            0.3
            * jax.random.normal(
                jax.random.fold_in(key, 1), (state_dim, obs_dim)
            ),
        )
        self._register_param(
            "trans_noise_scale_sq",
            jnp.ones(state_dim),
            constraints.positive,
        )
        self._register_param(
            "init_noise_scale_sq",
            jnp.ones(state_dim),
            constraints.positive,
        )
        if learnable_observation_loc:
            self._register_param("obs_loc", jnp.zeros(obs_dim))
        self._learnable_obs_loc = learnable_observation_loc

    def _gp_obs_matrix(self):
        sd = self.kernel.state_dim
        m = jnp.zeros((self.gp_state_dim, self.obs_dim))
        for i in range(self.obs_dim):
            m = m.at[sd * i, i].set(1.0)
        return m

    def get_dist(self, duration=None):
        from ...ops.tensor_utils import block_diag_embed

        sd = self.kernel.state_dim
        # GP block (column convention from the kernel -> transpose at end)
        A_gp, Q_gp = self.kernel.transition_matrix_and_covariance(
            self.length_scale, self.kernel_scale, self.dt
        )
        A_gp = block_diag_embed(A_gp)  # (gp, gp), z' = A z
        Q_gp = block_diag_embed(Q_gp)
        P_gp = block_diag_embed(
            self.kernel.stationary_covariance(
                self.length_scale, self.kernel_scale
            )
        )
        # z block
        A_z = self.z_trans_matrix  # row convention for the z-state
        Q_z = jnp.diag(self.trans_noise_scale_sq)
        P_z = jnp.diag(self.init_noise_scale_sq)

        n = self.full_state_dim
        gp = self.gp_state_dim
        # full transition in ROW convention: [[A_gp^T, 0], [0, A_z]]
        trans = jnp.zeros((n, n))
        trans = trans.at[:gp, :gp].set(A_gp.T)
        trans = trans.at[gp:, gp:].set(A_z)
        trans_cov = jnp.zeros((n, n))
        trans_cov = trans_cov.at[:gp, :gp].set(Q_gp)
        trans_cov = trans_cov.at[gp:, gp:].set(Q_z)
        init_cov = jnp.zeros((n, n))
        init_cov = init_cov.at[:gp, :gp].set(P_gp)
        init_cov = init_cov.at[gp:, gp:].set(P_z)

        obs_matrix = jnp.concatenate(
            [self._gp_obs_matrix(), self.z_obs_matrix], axis=0
        )
        obs_loc = (
            self.obs_loc
            if self._learnable_obs_loc
            else jnp.zeros(self.obs_dim)
        )
        init = dist.MultivariateNormal(
            jnp.zeros(n), covariance_matrix=init_cov
        )
        trans_dist = dist.MultivariateNormal(
            jnp.zeros(n), covariance_matrix=trans_cov + 1e-6 * jnp.eye(n)
        )
        obs_dist = dist.Normal(obs_loc, self.obs_noise_scale).to_event(1)
        return dist.GaussianHMM(
            init, trans, trans_dist, obs_matrix, obs_dist, duration=duration
        )

    def log_prob(self, targets):
        assert targets.ndim == 2 and targets.shape[-1] == self.obs_dim
        return self.get_dist(duration=targets.shape[0]).log_prob(targets)
