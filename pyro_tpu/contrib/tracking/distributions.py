"""EKF innovation-likelihood distribution.

Ref ``pyro/contrib/tracking/distributions.py:13`` (EKFDistribution): the
joint log-probability of a measurement sequence under an EKF with a given
dynamic model is the product of per-step innovation Gaussians.

TPU design: the reference loops in Python over time; here the
predict/update recursion is a single ``lax.scan``, so ``log_prob``
compiles to one fused program regardless of ``time_steps``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist
from pyro_tpu.distributions import constraints
from pyro_tpu.distributions.distribution import Distribution

from .extended_kalman_filter import EKFState
from .measurements import PositionMeasurement


class EKFDistribution(Distribution):
    """Ref ``tracking/distributions.py:13``.  Currently supports
    ``log_prob`` and ``filter_states``; ``rsample`` is unimplemented (as
    in the reference)."""

    arg_constraints = {
        "measurement_cov": constraints.positive_definite,
        "P0": constraints.positive_definite,
        "x0": constraints.real_vector,
    }
    has_rsample = True

    def __init__(
        self,
        x0,
        P0,
        dynamic_model,
        measurement_cov,
        time_steps: int = 1,
        dt: float = 1.0,
        validate_args=None,
    ):
        self.x0 = jnp.asarray(x0)
        self.P0 = jnp.asarray(P0)
        self.dynamic_model = dynamic_model
        self.measurement_cov = jnp.asarray(measurement_cov)
        self.dt = dt
        assert not self.x0.shape[-1] % 2, (
            "position and velocity vectors must be the same dimension"
        )
        batch_shape = self.x0.shape[:-1]
        event_shape = (time_steps, self.x0.shape[-1] // 2)
        super().__init__(batch_shape, event_shape)

    def rsample(self, key, sample_shape=()):
        raise NotImplementedError(
            "TODO: implement forward filter backward sample"
        )

    def _scan(self, value):
        """Run the EKF over measurements; returns stacked (means, covs,
        innovations dz, innovation covs S)."""
        d = self.x0.shape[-1]
        obs_dim = self.event_shape[-1]
        model = self.dynamic_model
        meas_cov = self.measurement_cov
        dt = self.dt

        def step(carry, inputs):
            mean, cov, t = carry
            z, first = inputs
            # predict on every step except the first (ref
            # ``distributions.py:72-74``), branchlessly under scan
            pred = EKFState(model, mean, cov, time=t).predict(dt)
            mean_p = jnp.where(first, mean, pred.mean)
            cov_p = jnp.where(first, cov, pred.cov)
            state = EKFState(model, mean_p, cov_p, time=t)
            measurement = PositionMeasurement(z, meas_cov, time=t)
            new_state, (dz, S) = state.update(measurement)
            return (
                (new_state.mean, new_state.cov, t + dt),
                (new_state.mean, new_state.cov, dz, S),
            )

        T = value.shape[-2]
        first = jnp.arange(T) == 0
        (_, _, _), (means, covs, dzs, Ss) = jax.lax.scan(
            step, (self.x0, self.P0, 0.0), (value, first)
        )
        return means, covs, dzs, Ss

    def filter_states(self, value):
        """EKF states for a measurement sequence (ref
        ``distributions.py:63``)."""
        means, covs, _, _ = self._scan(value)
        return [
            EKFState(
                self.dynamic_model,
                means[i],
                covs[i],
                time=i * self.dt,
            )
            for i in range(value.shape[-2])
        ]

    def log_prob(self, value):
        """Joint innovation log-likelihood (ref ``distributions.py:83``)."""
        assert value.shape[-2:] == self.event_shape
        _, _, dzs, Ss = self._scan(value)
        lp = dist.MultivariateNormal(
            dzs, covariance_matrix=Ss
        ).log_prob(jnp.zeros(self.event_shape[-1]))
        return jnp.sum(lp, axis=-1)
