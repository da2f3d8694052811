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
