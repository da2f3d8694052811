"""Dynamic-model family for multi-object tracking.

Ref ``pyro/contrib/tracking/dynamic_models.py``: ``DynamicModel:14``,
``DifferentiableDynamicModel:129``, ``Ncp:147``, ``Ncv:233``,
``NcpContinuous:321``, ``NcvContinuous:355``, ``NcpDiscrete:398``,
``NcvDiscrete:428``.

JAX design: models are pure callables (``model(x, dt)`` integrates the
state) with no mutable caches — XLA constant-folds the per-``dt``
transition and noise matrices under ``jit``.  ``sa2``/``sv2`` noise
variances are plain arrays so they can be ``pyro.param``-backed and
trained.
"""

from __future__ import annotations

from abc import ABC, abstractmethod

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist


class DynamicModel(ABC):
    """Ref ``dynamic_models.py:14``."""

    def __init__(self, dimension, dimension_pv, num_process_noise_parameters=None):
        self._dimension = dimension
        self._dimension_pv = dimension_pv
        self._num_process_noise_parameters = num_process_noise_parameters

    @property
    def dimension(self):
        return self._dimension

    @property
    def dimension_pv(self):
        return self._dimension_pv

    @property
    def num_process_noise_parameters(self):
        return self._num_process_noise_parameters

    @abstractmethod
    def __call__(self, x, dt, do_normalization: bool = True):
        """Integrate native state ``x`` over time interval ``dt``."""
        raise NotImplementedError

    def forward(self, x, dt, do_normalization: bool = True):
        """Reference nn.Module API alias for ``__call__``."""
        return self(x, dt, do_normalization)

    def geodesic_difference(self, x1, x0):
        return x1 - x0  # Euclidean default

    @abstractmethod
    def mean2pv(self, x):
        raise NotImplementedError

    @abstractmethod
    def cov2pv(self, P):
        raise NotImplementedError

    @abstractmethod
    def process_noise_cov(self, dt=0.0):
        raise NotImplementedError

    def process_noise_dist(self, dt=0.0):
        """Process-noise displacement distribution over ``dt``
        (ref ``dynamic_models.py:115``)."""
        Q = self.process_noise_cov(dt)
        return dist.MultivariateNormal(
            jnp.zeros(Q.shape[-1]), covariance_matrix=Q
        )


class DifferentiableDynamicModel(DynamicModel):
    """Base for models whose Jacobian exists; under JAX every model is
    differentiable via ``jax.jacfwd``, so this only carries the default
    Jacobian (ref ``dynamic_models.py:129``)."""

    def jacobian(self, dt):
        """d(state')/d(state) of the integration map at dt."""
        x0 = jnp.zeros(self._dimension)
        return jax.jacfwd(lambda x: self(x, dt))(x0)


class Ncp(DifferentiableDynamicModel):
    """Nearly-Constant Position (ref ``dynamic_models.py:147``)."""

    def __init__(self, dimension, sv2):
        super().__init__(
            dimension, 2 * dimension, num_process_noise_parameters=1
        )
        self.sv2 = jnp.asarray(sv2)

    def __call__(self, x, dt, do_normalization: bool = True):
        return x

    def mean2pv(self, x):
        return jnp.concatenate([x, jnp.zeros_like(x)], axis=-1)

    def cov2pv(self, P):
        d = self._dimension
        P_pv = jnp.zeros(P.shape[:-2] + (2 * d, 2 * d))
        return P_pv.at[..., :d, :d].set(P)

    def jacobian(self, dt):
        return jnp.eye(self._dimension)


class Ncv(DifferentiableDynamicModel):
    """Nearly-Constant Velocity: state = [pos, vel]
    (ref ``dynamic_models.py:233``)."""

    def __init__(self, dimension, sa2):
        super().__init__(dimension, dimension, num_process_noise_parameters=1)
        assert dimension % 2 == 0, "NCV state must stack [pos, vel]"
        self.sa2 = jnp.asarray(sa2)

    def __call__(self, x, dt, do_normalization: bool = True):
        d = self._dimension // 2
        pos, vel = x[..., :d], x[..., d:]
        return jnp.concatenate([pos + dt * vel, vel], axis=-1)

    def mean2pv(self, x):
        return x

    def cov2pv(self, P):
        return P

    def jacobian(self, dt):
        d = self._dimension // 2
        F = jnp.eye(self._dimension)
        return F.at[:d, d:].set(dt * jnp.eye(d))


class NcpContinuous(Ncp):
    """NCP with continuous white-noise velocity
    (ref ``dynamic_models.py:321``; Bar-Shalom et al. 2001, p.269)."""

    def process_noise_cov(self, dt=0.0):
        q = self.sv2 * dt
        return q * dt * jnp.eye(self._dimension)


class NcvContinuous(Ncv):
    """NCV with continuous white-noise acceleration
    (ref ``dynamic_models.py:355``; Bar-Shalom et al. 2001, p.269).

    Accepts ``sv2`` as a deprecated alias of ``sa2`` for backward
    compatibility with the round-1 ``extended_kalman_filter`` class.
    """

    def __init__(self, dimension, sa2=None, sv2=None):
        if sa2 is None:
            sa2 = sv2
        if sa2 is None:
            raise TypeError("NcvContinuous requires sa2")
        super().__init__(dimension, sa2)

    def process_noise_cov(self, dt=0.0):
        d = self._dimension // 2
        eye = jnp.eye(d)
        Q = jnp.zeros((self._dimension, self._dimension))
        Q = Q.at[:d, :d].set(dt**3 * eye / 3.0)
        Q = Q.at[:d, d:].set(dt**2 * eye / 2.0)
        Q = Q.at[d:, :d].set(dt**2 * eye / 2.0)
        Q = Q.at[d:, d:].set(dt * eye)
        return Q * (self.sa2 * dt)


class NcpDiscrete(Ncp):
    """NCP with discrete white-noise velocity
    (ref ``dynamic_models.py:398``; Bar-Shalom et al. 2001, p.273)."""

    def process_noise_cov(self, dt=0.0):
        return self.sv2 * dt * dt * jnp.eye(self._dimension)


class NcvDiscrete(Ncv):
    """NCV with discrete white-noise acceleration
    (ref ``dynamic_models.py:428``; Bar-Shalom et al. 2001, p.273).
    Note the resulting Q has rank ``dimension/2`` (positive
    semi-definite)."""

    def process_noise_cov(self, dt=0.0):
        d = self._dimension // 2
        eye = jnp.eye(d)
        Q = jnp.zeros((self._dimension, self._dimension))
        Q = Q.at[:d, :d].set(0.25 * dt**4 * eye)
        Q = Q.at[:d, d:].set(0.5 * dt**3 * eye)
        Q = Q.at[d:, :d].set(0.5 * dt**3 * eye)
        Q = Q.at[d:, d:].set(dt**2 * eye)
        return Q * self.sa2
