"""State-space GP time series (ref ``pyro/contrib/timeseries/gp.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist
from ...distributions import constraints
from ...ops.ssm_gp import MaternKernel
from ..gp.parameterized import Parameterized
from .base import TimeSeriesModel


class IndependentMaternGP(TimeSeriesModel):
    """Independent Matern GP per observed dim, exact SSM filtering
    (ref ``gp.py:17``)."""

    def __init__(
        self,
        nu: float = 1.5,
        dt: float = 1.0,
        obs_dim: int = 1,
        length_scale_init=None,
        kernel_scale_init=None,
        obs_noise_scale_init=None,
        name=None,
    ):
        super().__init__(name)
        self.nu = nu
        self.dt = dt
        self.obs_dim = obs_dim
        self.kernel = MaternKernel(nu, obs_dim)
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

    def _get_init_dist(self):
        P = self.kernel.stationary_covariance(
            self.length_scale, self.kernel_scale
        )
        return dist.MultivariateNormal(
            jnp.zeros((self.obs_dim, self.kernel.state_dim)),
            covariance_matrix=P,
        )

    def get_dist(self, duration=None):
        """The underlying IndependentHMM over (T, obs_dim)
        (ref ``gp.py:get_dist``)."""
        A, Q = self.kernel.transition_matrix_and_covariance(
            self.length_scale, self.kernel_scale, self.dt
        )
        # GaussianHMM uses the row-vector convention z' = z @ M, so
        # M = A^T for the column-convention SSM matrices
        A = jnp.swapaxes(A, -1, -2)
        sd = self.kernel.state_dim
        obs_matrix = jnp.zeros((self.obs_dim, 1, sd, 1))
        obs_matrix = obs_matrix.at[:, 0, 0, 0].set(1.0)
        trans = dist.MultivariateNormal(
            jnp.zeros((self.obs_dim, 1, sd)), covariance_matrix=Q[:, None]
        )
        obs_noise = dist.Normal(
            jnp.zeros((self.obs_dim, 1, 1)),
            self.obs_noise_scale[:, None, None],
        ).to_event(1)
        base = dist.GaussianHMM(
            self._get_init_dist(),
            A[:, None],
            trans,
            obs_matrix,
            obs_noise,
            duration=duration,
        )
        return dist.IndependentHMM(base)

    def log_prob(self, targets):
        """targets: (T, obs_dim) -> per-dim log probs of shape
        (obs_dim,) (ref ``gp.py:107``: each Matern GP is independent and
        scored separately)."""
        base = self.get_dist(duration=targets.shape[0]).base_dist
        value = jnp.moveaxis(targets, -1, 0)[..., None]
        return base.log_prob(value)

    def _filter_state(self, targets):
        A, Q = self.kernel.transition_matrix_and_covariance(
            self.length_scale, self.kernel_scale, self.dt
        )
        base = self.get_dist(duration=targets.shape[0]).base_dist
        value = jnp.moveaxis(targets, -1, 0)[..., None]
        return base.filter(value)

    def forecast(self, targets, dts):
        """Posterior predictive at future offsets ``dts``
        (ref ``gp.py:forecast``): returns a Normal over (len(dts), obs_dim)."""
        filtered = self._filter_state(targets)  # MVN batch (obs_dim,)
        loc = filtered.loc
        cov = filtered.covariance_matrix
        locs, scales = [], []
        for dt in jnp.atleast_1d(jnp.asarray(dts)):
            A, Q = self.kernel.transition_matrix_and_covariance(
                self.length_scale, self.kernel_scale, dt
            )
            # column-convention rollout: z' = A z
            pred_loc = jnp.einsum("bij,bj->bi", A, loc)
            pred_cov = A @ cov @ jnp.swapaxes(A, -1, -2) + Q
            locs.append(pred_loc[:, 0])
            scales.append(
                jnp.sqrt(
                    pred_cov[:, 0, 0] + self.obs_noise_scale**2
                )
            )
        return dist.Normal(jnp.stack(locs), jnp.stack(scales))


class LinearlyCoupledMaternGP(TimeSeriesModel):
    """obs_dim outputs as linear mixtures of num_gps latent Matern GPs
    (ref ``gp.py:171``)."""

    def __init__(
        self,
        nu: float = 1.5,
        dt: float = 1.0,
        obs_dim: int = 2,
        num_gps: int = 1,
        length_scale_init=None,
        kernel_scale_init=None,
        obs_noise_scale_init=None,
        name=None,
    ):
        super().__init__(name)
        self.nu = nu
        self.dt = dt
        self.obs_dim = obs_dim
        self.num_gps = num_gps
        self.kernel = MaternKernel(nu, num_gps)
        self._register_param(
            "length_scale",
            length_scale_init if length_scale_init is not None else jnp.ones(num_gps),
            constraints.positive,
        )
        self._register_param(
            "kernel_scale",
            kernel_scale_init if kernel_scale_init is not None else jnp.ones(num_gps),
            constraints.positive,
        )
        self._register_param(
            "obs_noise_scale",
            obs_noise_scale_init if obs_noise_scale_init is not None else 0.2 * jnp.ones(obs_dim),
            constraints.positive,
        )
        import numpy as np

        self._register_param(
            "A_mix",
            0.3
            * jax.random.normal(
                jax.random.key(0), (num_gps, obs_dim)
            ),
        )

    def get_dist(self, duration=None):
        from ...ops.tensor_utils import block_diag_embed

        A, Q = self.kernel.transition_matrix_and_covariance(
            self.length_scale, self.kernel_scale, self.dt
        )
        A = jnp.swapaxes(A, -1, -2)  # row-vector convention (see above)
        sd = self.kernel.state_dim
        full_dim = self.num_gps * sd
        trans_matrix = block_diag_embed(A)  # (full, full)
        trans_cov = block_diag_embed(Q)
        P = block_diag_embed(
            self.kernel.stationary_covariance(
                self.length_scale, self.kernel_scale
            )
        )
        # selector: outputs mix the position component of each GP
        sel = jnp.zeros((self.num_gps, full_dim))
        for g in range(self.num_gps):
            sel = sel.at[g, g * sd].set(1.0)
        # y = z @ M where M[g*sd, j] = A_mix[g, j] mixes GP positions
        obs_matrix = sel.T @ self.A_mix
        init = dist.MultivariateNormal(
            jnp.zeros(full_dim), covariance_matrix=P
        )
        trans = dist.MultivariateNormal(
            jnp.zeros((1, full_dim)), covariance_matrix=trans_cov[None]
        )
        obs_noise = dist.Normal(
            jnp.zeros((1, self.obs_dim)), self.obs_noise_scale[None]
        ).to_event(1)
        return dist.GaussianHMM(
            init,
            trans_matrix[None],
            trans,
            obs_matrix[None],
            obs_noise,
            duration=duration,
        )

    def log_prob(self, targets):
        return self.get_dist(duration=targets.shape[0]).log_prob(targets)

    def forecast(self, targets, dts):
        raise NotImplementedError(
            "use get_dist().filter + manual rollout; see IndependentMaternGP"
        )


class DependentMaternGP(TimeSeriesModel):
    """Multivariate Matern-1.5 GPs driven by a CORRELATED Wiener process
    (ref ``gp.py:356``; Vandenberg-Rodes & Shahbaba): cross-output
    correlation comes from the lower-Cholesky ``wiener_noise_tril``;
    optionally also linear mixing as in :class:`LinearlyCoupledMaternGP`.
    Filtering stays O(log T) via GaussianHMM.
    """

    def __init__(
        self,
        nu: float = 1.5,
        dt: float = 1.0,
        obs_dim: int = 1,
        linearly_coupled: bool = False,
        length_scale_init=None,
        obs_noise_scale_init=None,
        name=None,
    ):
        if nu != 1.5:
            raise NotImplementedError("The only supported value of nu is 1.5")
        super().__init__(name)
        self.nu = nu
        self.dt = dt
        self.obs_dim = obs_dim
        self.linearly_coupled = linearly_coupled
        self.kernel = MaternKernel(nu, obs_dim)
        self.full_state_dim = self.kernel.state_dim * obs_dim
        self._register_param(
            "length_scale",
            length_scale_init
            if length_scale_init is not None
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
        import numpy as np

        rs = np.random.RandomState(0)
        self._register_param(
            "wiener_noise_tril",
            jnp.asarray(
                np.eye(obs_dim)
                + 0.03 * np.tril(rs.randn(obs_dim, obs_dim), -1),
                jnp.float32,
            ),
            constraints.lower_cholesky,
        )
        if linearly_coupled:
            self._register_param(
                "mix_matrix",
                jnp.asarray(
                    0.3 * rs.randn(obs_dim, obs_dim), jnp.float32
                ),
            )

    def _get_wiener_cov(self):
        n, sd = self.obs_dim, self.kernel.state_dim
        chol = self.wiener_noise_tril
        W = chol @ chol.T  # (n, n)
        # expand to (n*sd, n*sd): constant within each 2x2 block
        return jnp.repeat(jnp.repeat(W, sd, axis=0), sd, axis=1)

    def _stationary_covariance(self):
        """Cross-GP stationary covariance of the coupled SSM
        (ref ``gp.py:_stationary_covariance``): per (i, j) pair of GPs
        the 2x2 block is
        [[2, rho_i - rho_j], [rho_j - rho_i, 2 rho_i rho_j]] / (rho_i+rho_j)^3,
        scaled by the Wiener covariance."""
        n, sd = self.obs_dim, self.kernel.state_dim
        rho = jnp.sqrt(3.0) / self.length_scale  # (n,)
        rho_i = rho[:, None]
        rho_j = rho[None, :]
        denom = (rho_i + rho_j) ** 3
        block = jnp.stack(
            [
                jnp.stack(
                    [2.0 / denom, (rho_i - rho_j) / denom], axis=-1
                ),
                jnp.stack(
                    [(rho_j - rho_i) / denom, 2.0 * rho_i * rho_j / denom],
                    axis=-1,
                ),
            ],
            axis=-2,
        )  # (n, n, 2, 2)
        full = jnp.transpose(block, (0, 2, 1, 3)).reshape(
            self.full_state_dim, self.full_state_dim
        )
        return self._get_wiener_cov() * full

    def _get_obs_matrix(self):
        """(full_state_dim, obs_dim) mixing matrix: each output reads the
        position component of its (or, if linearly coupled, every) GP."""
        n, sd = self.obs_dim, self.kernel.state_dim
        sel = jnp.zeros((n, self.full_state_dim))
        for i in range(n):
            sel = sel.at[i, sd * i].set(1.0)
        if self.linearly_coupled:
            return sel.T @ self.mix_matrix
        return sel.T

    def get_dist(self, duration=None):
        from ...ops.tensor_utils import block_diag_embed

        # per-GP transition (column convention from the kernel), coupled
        # stationary covariance
        A_col = self.kernel.transition_matrix(self.length_scale, self.dt)
        A_col = block_diag_embed(A_col)  # (full, full), z' = A z
        S = self._stationary_covariance()
        trans_cov = S - A_col @ S @ A_col.T
        trans_cov = 0.5 * (trans_cov + trans_cov.T) + 1e-6 * jnp.eye(
            self.full_state_dim
        )
        init = dist.MultivariateNormal(
            jnp.zeros(self.full_state_dim), covariance_matrix=S
        )
        trans = dist.MultivariateNormal(
            jnp.zeros(self.full_state_dim), covariance_matrix=trans_cov
        )
        obs_noise = dist.Normal(
            jnp.zeros(self.obs_dim), self.obs_noise_scale
        ).to_event(1)
        return dist.GaussianHMM(
            init,
            A_col.T,  # row-vector convention z' = z @ M
            trans,
            self._get_obs_matrix(),
            obs_noise,
            duration=duration,
        )

    def log_prob(self, targets):
        """targets: (T, obs_dim) -> scalar log probability."""
        assert targets.ndim == 2 and targets.shape[-1] == self.obs_dim
        return self.get_dist(duration=targets.shape[0]).log_prob(targets)
