"""Measurement models (ref ``pyro/contrib/tracking/measurements.py``)."""

from __future__ import annotations

import jax.numpy as jnp


class PositionMeasurement:
    """Linear position measurement of a [pos, vel] state
    (ref ``measurements.py:PositionMeasurement``)."""

    def __init__(self, mean, cov, time: float = 0.0):
        self.mean = jnp.asarray(mean)
        self.cov = jnp.asarray(cov)
        self.time = time
        self.dimension = self.mean.shape[-1]

    def h(self, x):
        return x[..., : self.dimension]

    def geodesic_difference(self, z1, z0):
        return z1 - z0
