"""GP models (ref ``pyro/contrib/gp/models/``): GPRegression (exact),
SparseGPRegression (DTC/FITC/VFE), VariationalGP, VariationalSparseGP,
GPLVM."""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

import pyro_tpu.distributions as dist
from ...distributions import constraints
from ...primitives import sample as pyro_sample
from ...primitives import param as pyro_param
from .parameterized import Parameterized
from .util import conditional


class GPModel(Parameterized):
    """Ref ``models/model.py``."""

    def __init__(self, X, y, kernel, mean_function=None, jitter=1e-6, name=None):
        super().__init__(name)
        self.X = X
        self.y = y
        self.kernel = kernel
        self.mean_function = mean_function or (lambda x: jnp.zeros(x.shape[0]))
        self.jitter = jitter

    def set_data(self, X, y=None) -> None:
        self.X = X
        self.y = y

    def model(self):
        raise NotImplementedError

    def guide(self):
        raise NotImplementedError

    def forward(self, Xnew, full_cov: bool = False):
        raise NotImplementedError

    def __call__(self, Xnew, full_cov: bool = False):
        return self.forward(Xnew, full_cov)


class GPRegression(GPModel):
    """Exact GP regression (ref ``models/gpr.py``)."""

    def __init__(self, X, y, kernel, noise=1.0, mean_function=None, jitter=1e-6, name=None):
        super().__init__(X, y, kernel, mean_function, jitter, name)
        self._register_param("noise", noise, constraints.positive)

    def model(self):
        self.set_mode("model")
        N = self.X.shape[0]
        Kff = self.kernel(self.X) + (
            self.noise + self.jitter
        ) * jnp.eye(N)
        Lff = jnp.linalg.cholesky(Kff)
        loc = self.mean_function(self.X)
        return pyro_sample(
            f"{self._pyro_name}.y",
            dist.MultivariateNormal(loc, scale_tril=Lff),
            obs=self.y,
        )

    def guide(self):
        self.set_mode("guide")

    def forward(self, Xnew, full_cov: bool = False, noiseless: bool = True):
        """Exact posterior predictive (ref ``gpr.py:forward``)."""
        self.set_mode("guide")
        N = self.X.shape[0]
        Kff = self.kernel(self.X) + (
            self.noise + self.jitter
        ) * jnp.eye(N)
        Lff = jnp.linalg.cholesky(Kff)
        resid = self.y - self.mean_function(self.X)
        loc, cov = conditional(
            Xnew,
            self.X,
            self.kernel,
            resid[None] if resid.ndim == 1 else resid,
            Lff=Lff,
            full_cov=full_cov,
            jitter=self.jitter,
        )
        loc = loc.reshape(Xnew.shape[0]) + self.mean_function(Xnew)
        if not noiseless:
            cov = cov + self.noise * (
                jnp.eye(Xnew.shape[0]) if full_cov else 1.0
            )
        return loc, cov


class SparseGPRegression(GPModel):
    """Sparse GP with DTC/FITC/VFE approximations (ref ``models/sgpr.py``)."""

    def __init__(self, X, y, kernel, Xu, noise=1.0, approx: str = "VFE", mean_function=None, jitter=1e-6, name=None):
        super().__init__(X, y, kernel, mean_function, jitter, name)
        assert approx in ("DTC", "FITC", "VFE")
        self.approx = approx
        self._register_param("Xu", Xu)
        self._register_param("noise", noise, constraints.positive)

    def model(self):
        self.set_mode("model")
        Xu = self.Xu
        M = Xu.shape[0]
        N = self.X.shape[0]
        Kuu = self.kernel(Xu) + self.jitter * jnp.eye(M)
        Luu = jnp.linalg.cholesky(Kuu)
        Kuf = self.kernel(Xu, self.X)
        W = solve_triangular(Luu, Kuf, lower=True)  # (M, N)
        Qff_diag = jnp.sum(W**2, axis=0)
        Kff_diag = self.kernel(self.X, diag=True)
        if self.approx == "FITC":
            noise_diag = self.noise + jnp.clip(Kff_diag - Qff_diag, 0.0)
        else:  # DTC and VFE use homoskedastic noise
            noise_diag = self.noise * jnp.ones(N)
        if self.approx == "VFE":
            # Titsias bound's trace correction (ref sgpr.py model)
            from ...primitives import factor

            trace_term = (
                jnp.sum(jnp.clip(Kff_diag - Qff_diag, 0.0)) / self.noise
            )
            factor(f"{self._pyro_name}.trace_term", -0.5 * trace_term)
        loc = self.mean_function(self.X)
        return pyro_sample(
            f"{self._pyro_name}.y",
            dist.LowRankMultivariateNormal(loc, W.T, noise_diag),
            obs=self.y,
        )

    def guide(self):
        self.set_mode("guide")

    def forward(self, Xnew, full_cov: bool = False, noiseless: bool = True):
        """Posterior predictive through the inducing points
        (ref ``sgpr.py:forward``)."""
        self.set_mode("guide")
        Xu = self.Xu
        M = Xu.shape[0]
        N = self.X.shape[0]
        Kuu = self.kernel(Xu) + self.jitter * jnp.eye(M)
        Luu = jnp.linalg.cholesky(Kuu)
        Kuf = self.kernel(Xu, self.X)
        W = solve_triangular(Luu, Kuf, lower=True)
        Kff_diag = self.kernel(self.X, diag=True)
        Qff_diag = jnp.sum(W**2, axis=0)
        if self.approx == "FITC":
            D = self.noise + jnp.clip(Kff_diag - Qff_diag, 0.0)
        else:
            D = self.noise * jnp.ones(N)
        # posterior over u: standard sparse GP algebra
        W_D = W / D
        K = W_D @ W.T + jnp.eye(M)
        L = jnp.linalg.cholesky(K)
        resid = self.y - self.mean_function(self.X)
        y_2D = resid.reshape(-1, N).T
        Z = solve_triangular(L, W_D @ y_2D, lower=True)  # (M, L)

        Kus = self.kernel(Xu, Xnew)
        Ws = solve_triangular(Luu, Kus, lower=True)  # (M, S)
        pack = solve_triangular(L, Ws, lower=True)  # (M, S)
        loc = (pack.T @ Z).T.reshape(Xnew.shape[0]) + self.mean_function(
            Xnew
        )
        if full_cov:
            Kss = self.kernel(Xnew)
            Qss = Ws.T @ Ws
            cov = Kss - Qss + pack.T @ pack
            if not noiseless:
                cov = cov + self.noise * jnp.eye(Xnew.shape[0])
        else:
            Kssdiag = self.kernel(Xnew, diag=True)
            Qssdiag = jnp.sum(Ws**2, axis=0)
            cov = jnp.clip(Kssdiag - Qssdiag, 0.0) + jnp.sum(
                pack**2, axis=0
            )
            if not noiseless:
                cov = cov + self.noise
        return loc, cov


class VariationalGP(GPModel):
    """Whole-dataset variational GP (ref ``models/vgp.py``)."""

    def __init__(self, X, y, kernel, likelihood, mean_function=None, latent_shape=(), whiten=False, jitter=1e-6, name=None):
        super().__init__(X, y, kernel, mean_function, jitter, name)
        self.likelihood = likelihood
        self.latent_shape = tuple(latent_shape)
        self.whiten = whiten

    def model(self):
        self.set_mode("model")
        N = self.X.shape[0]
        Kff = self.kernel(self.X) + self.jitter * jnp.eye(N)
        Lff = jnp.linalg.cholesky(Kff)
        zero_loc = jnp.zeros(self.latent_shape + (N,))
        if self.whiten:
            f_white = pyro_sample(
                f"{self._pyro_name}.f",
                dist.Normal(zero_loc, 1.0).to_event(zero_loc.ndim),
            )
            f = (Lff @ f_white[..., None])[..., 0] + self.mean_function(
                self.X
            )
        else:
            f = pyro_sample(
                f"{self._pyro_name}.f",
                dist.MultivariateNormal(
                    zero_loc + self.mean_function(self.X), scale_tril=Lff
                ).to_event(len(self.latent_shape)),
            )
        f_var = jnp.zeros_like(f)
        return self.likelihood(f, f_var, self.y)

    def guide(self):
        self.set_mode("guide")
        N = self.X.shape[0]
        f_loc = pyro_param(
            f"{self._pyro_name}.f_loc", jnp.zeros(self.latent_shape + (N,))
        )
        f_scale_tril = pyro_param(
            f"{self._pyro_name}.f_scale_tril",
            0.1 * jnp.broadcast_to(jnp.eye(N), self.latent_shape + (N, N)),
            constraint=constraints.lower_cholesky,
        )
        if self.whiten:
            pyro_sample(
                f"{self._pyro_name}.f",
                dist.MultivariateNormal(
                    f_loc, scale_tril=f_scale_tril
                ).to_event(len(self.latent_shape)),
            )
        else:
            pyro_sample(
                f"{self._pyro_name}.f",
                dist.MultivariateNormal(
                    f_loc, scale_tril=f_scale_tril
                ).to_event(len(self.latent_shape)),
            )
        return f_loc, f_scale_tril

    def forward(self, Xnew, full_cov: bool = False):
        self.set_mode("guide")
        from ...params.param_store import get_param_store

        store = get_param_store()
        f_loc = store[f"{self._pyro_name}.f_loc"]
        f_scale_tril = store[f"{self._pyro_name}.f_scale_tril"]
        loc, cov = conditional(
            Xnew,
            self.X,
            self.kernel,
            f_loc,
            f_scale_tril,
            full_cov=full_cov,
            whiten=self.whiten,
            jitter=self.jitter,
        )
        return loc + self.mean_function(Xnew), cov


class VariationalSparseGP(GPModel):
    """SVGP with inducing points (ref ``models/vsgp.py``).

    Supports minibatching through ``num_data`` scaling.
    """

    def __init__(
        self, X, y, kernel, Xu, likelihood, mean_function=None,
        latent_shape=(), num_data=None, whiten=False, jitter=1e-6, name=None,
    ):
        super().__init__(X, y, kernel, mean_function, jitter, name)
        self.likelihood = likelihood
        self._register_param("Xu", Xu)
        self.latent_shape = tuple(latent_shape)
        self.num_data = num_data if num_data is not None else X.shape[0]
        self.whiten = whiten

    def model(self):
        self.set_mode("model")
        Xu = self.Xu
        M = Xu.shape[0]
        Kuu = self.kernel(Xu) + self.jitter * jnp.eye(M)
        Luu = jnp.linalg.cholesky(Kuu)
        zero_loc = jnp.zeros(self.latent_shape + (M,))
        if self.whiten:
            u = pyro_sample(
                f"{self._pyro_name}.u",
                dist.Normal(zero_loc, 1.0).to_event(zero_loc.ndim),
            )
            u_unwhitened = (Luu @ u[..., None])[..., 0]
        else:
            u = pyro_sample(
                f"{self._pyro_name}.u",
                dist.MultivariateNormal(zero_loc, scale_tril=Luu).to_event(
                    len(self.latent_shape)
                ),
            )
            u_unwhitened = u
        f_loc, f_var = conditional(
            self.X,
            Xu,
            self.kernel,
            u if self.whiten else u_unwhitened,
            Lff=Luu,
            full_cov=False,
            whiten=self.whiten,
            jitter=self.jitter,
        )
        f_loc = f_loc + self.mean_function(self.X)
        from ... import poutine

        with poutine.scale(scale=self.num_data / self.X.shape[0]):
            return self.likelihood(f_loc, f_var, self.y)

    def guide(self):
        self.set_mode("guide")
        M = self.Xu.shape[0]
        u_loc = pyro_param(
            f"{self._pyro_name}.u_loc", jnp.zeros(self.latent_shape + (M,))
        )
        u_scale_tril = pyro_param(
            f"{self._pyro_name}.u_scale_tril",
            0.1 * jnp.broadcast_to(jnp.eye(M), self.latent_shape + (M, M)),
            constraint=constraints.lower_cholesky,
        )
        pyro_sample(
            f"{self._pyro_name}.u",
            dist.MultivariateNormal(u_loc, scale_tril=u_scale_tril).to_event(
                len(self.latent_shape)
            ),
        )
        return u_loc, u_scale_tril

    def forward(self, Xnew, full_cov: bool = False):
        self.set_mode("guide")
        from ...params.param_store import get_param_store

        store = get_param_store()
        u_loc = store[f"{self._pyro_name}.u_loc"]
        u_scale_tril = store[f"{self._pyro_name}.u_scale_tril"]
        loc, cov = conditional(
            Xnew,
            self.Xu,
            self.kernel,
            u_loc,
            u_scale_tril,
            full_cov=full_cov,
            whiten=self.whiten,
            jitter=self.jitter,
        )
        return loc + self.mean_function(Xnew), cov


class GPLVM(Parameterized):
    """GP latent variable model wrapper (ref ``models/gplvm.py``)."""

    def __init__(self, base_model, name=None):
        super().__init__(name)
        self.base_model = base_model
        X = base_model.X
        self._register_param("X_loc", X)
        self._register_param(
            "X_scale",
            jnp.full(X.shape, 0.1),
            constraints.softplus_positive,
        )
        self._prior = dist.Normal(jnp.zeros(X.shape), 1.0).to_event(
            X.ndim
        )

    def model(self):
        self.set_mode("model")
        X = pyro_sample(f"{self._pyro_name}.X", self._prior)
        self.base_model.set_data(X, self.base_model.y)
        return self.base_model.model()

    def guide(self):
        self.set_mode("guide")
        X = pyro_sample(
            f"{self._pyro_name}.X",
            dist.Normal(self.X_loc, self.X_scale).to_event(
                self.X_loc.ndim
            ),
        )
        self.base_model.set_data(X, self.base_model.y)
        return self.base_model.guide()
