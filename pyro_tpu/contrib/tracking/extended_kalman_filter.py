"""Extended Kalman filter state (ref
``pyro/contrib/tracking/extended_kalman_filter.py``)."""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist


class EKFState:
    """Gaussian belief over a dynamic-model state with EKF predict/update
    (ref ``extended_kalman_filter.py:EKFState``)."""

    def __init__(self, dynamic_model, mean, cov, time: float = 0.0):
        self._dynamic_model = dynamic_model
        self._mean = jnp.asarray(mean)
        self._cov = jnp.asarray(cov)
        self._time = time

    @property
    def dynamic_model(self):
        return self._dynamic_model

    @property
    def mean(self):
        return self._mean

    @property
    def cov(self):
        return self._cov

    @property
    def time(self):
        return self._time

    @property
    def dimension(self):
        return self._mean.shape[-1]

    def predict(self, dt: float) -> "EKFState":
        """Ref ``predict``."""
        f = lambda x: self._dynamic_model(x, dt)
        mean = f(self._mean)
        F = jax.jacfwd(f)(self._mean)
        Q = self._dynamic_model.process_noise_cov(dt)
        cov = F @ self._cov @ F.T + Q
        return EKFState(
            self._dynamic_model, mean, cov, self._time + dt
        )

    def innovation(self, measurement) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(dz, S): residual and innovation covariance (ref ``innovation``)."""
        h = measurement.h
        z_pred = h(self._mean)
        H = jax.jacfwd(h)(self._mean)
        dz = measurement.mean - z_pred
        S = H @ self._cov @ H.T + measurement.cov
        return dz, S

    def log_likelihood_of_update(self, measurement):
        dz, S = self.innovation(measurement)
        return dist.MultivariateNormal(
            jnp.zeros(dz.shape[-1]), covariance_matrix=S
        ).log_prob(dz)

    def update(self, measurement) -> Tuple["EKFState", Tuple]:
        """Ref ``update``: returns (new_state, (dz, S))."""
        h = measurement.h
        H = jax.jacfwd(h)(self._mean)
        dz, S = self.innovation(measurement)
        K = self._cov @ H.T @ jnp.linalg.inv(S)
        mean = self._mean + K @ dz
        I = jnp.eye(self.dimension)
        cov = (I - K @ H) @ self._cov
        return (
            EKFState(self._dynamic_model, mean, cov, self._time),
            (dz, S),
        )


# NcvContinuous moved to .dynamic_models (full Ncp/Ncv family); re-exported
# here for backward compatibility with round-1 imports.
from .dynamic_models import NcvContinuous  # noqa: E402
