"""Sequential Monte Carlo filtering.

Ref ``pyro/infer/smcfilter.py:25`` (SMCFilter, ``SMCState:179``): particles
are a vectorized plate dim; resampling is systematic multinomial when the
ESS drops below threshold.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .. import poutine
from ..poutine.plate_messenger import PlateMessenger
from ..poutine.util import prune_subsample_sites


class SMCFailed(ValueError):
    """Ref ``smcfilter.py:16``."""


class SMCState(dict):
    """Particle state: dict name -> (num_particles, ...) arrays with
    attached log weights (ref ``smcfilter.py:179``)."""

    def __init__(self, num_particles: int):
        super().__init__()
        self._num_particles = num_particles
        self._log_weights = jnp.zeros(num_particles)
        self._locked = False

    def __setitem__(self, key, value):
        if self._locked:
            raise RuntimeError(
                "cannot write to SMCState outside of model/guide steps"
            )
        super().__setitem__(key, value)


class SMCFilter:
    """Ref ``smcfilter.py:25``: model/guide expose ``init(state, ...)`` and
    ``step(state, ...)`` methods."""

    def __init__(
        self,
        model,
        guide,
        num_particles: int,
        max_plate_nesting: int,
        *,
        ess_threshold: float = 0.5,
    ):
        assert 0 < ess_threshold <= 1
        self.model = model
        self.guide = guide
        self.num_particles = num_particles
        self.max_plate_nesting = max_plate_nesting
        self.ess_threshold = ess_threshold
        self.state = SMCState(num_particles)
        self._rng = jax.random.key(29)

    def _next_key(self):
        self._rng, k = jax.random.split(self._rng)
        return k

    def _particle_plate(self):
        return PlateMessenger(
            "particles",
            self.num_particles,
            dim=-1 - self.max_plate_nesting,
        )

    def init(self, *args, **kwargs):
        self.particle_plate = self._particle_plate()
        key_g, key_m = jax.random.split(self._next_key())
        with self.particle_plate:
            guide_trace = poutine.trace(
                poutine.seed(self.guide.init, rng_key=key_g)
            ).get_trace(self.state, *args, **kwargs)
            model = poutine.replay(self.model.init, trace=guide_trace)
            model_trace = poutine.trace(
                poutine.seed(model, rng_key=key_m)
            ).get_trace(self.state, *args, **kwargs)
        self._update_weights(model_trace, guide_trace)
        self._maybe_importance_resample()

    def step(self, *args, **kwargs):
        self.particle_plate = self._particle_plate()
        key_g, key_m = jax.random.split(self._next_key())
        with self.particle_plate:
            guide_trace = poutine.trace(
                poutine.seed(self.guide.step, rng_key=key_g)
            ).get_trace(self.state, *args, **kwargs)
            model = poutine.replay(self.model.step, trace=guide_trace)
            model_trace = poutine.trace(
                poutine.seed(model, rng_key=key_m)
            ).get_trace(self.state, *args, **kwargs)
        self._update_weights(model_trace, guide_trace)
        self._maybe_importance_resample()

    def get_empirical(self) -> Dict[str, dict]:
        """Weighted empirical marginals of the current state."""
        w = jax.nn.softmax(self.state._log_weights)
        out = {}
        for name, value in self.state.items():
            mean = jnp.einsum("i,i...->...", w, value)
            var = jnp.einsum(
                "i,i...->...", w, (value - mean) ** 2
            )
            out[name] = {"mean": mean, "variance": var}
        return out

    def _update_weights(self, model_trace, guide_trace):
        model_trace = prune_subsample_sites(model_trace)
        guide_trace = prune_subsample_sites(guide_trace)
        model_trace.compute_log_prob()
        guide_trace.compute_score_parts()
        lw = self.state._log_weights
        for name, site in model_trace.nodes.items():
            if site["type"] == "sample":
                lp = site["log_prob"]
                lw = lw + _sum_to_particles(lp, self.num_particles)
        for name, site in guide_trace.nodes.items():
            if site["type"] == "sample":
                lp = site["log_prob"]
                lw = lw - _sum_to_particles(lp, self.num_particles)
        lw = lw - logsumexp(lw)
        if not bool(jnp.isfinite(logsumexp(lw))):
            raise SMCFailed(
                "all particles have zero weight; try more particles or a "
                "better guide"
            )
        self.state._log_weights = lw

    def _maybe_importance_resample(self):
        lw = self.state._log_weights
        ess = float(jnp.exp(-logsumexp(2 * (lw - logsumexp(lw)))))
        if ess < self.ess_threshold * self.num_particles:
            self._importance_resample()

    def _importance_resample(self):
        key = self._next_key()
        w = jax.nn.softmax(self.state._log_weights)
        # systematic resampling
        n = self.num_particles
        u = jax.random.uniform(key, ()) / n
        positions = u + jnp.arange(n) / n
        idx = jnp.searchsorted(jnp.cumsum(w), positions)
        idx = jnp.clip(idx, 0, n - 1)
        for name in list(self.state.keys()):
            dict.__setitem__(
                self.state, name, jnp.take(self.state[name], idx, axis=0)
            )
        self.state._log_weights = jnp.zeros(n)


def _sum_to_particles(lp, num_particles):
    """Sum a log-prob over all dims except the leading particle dim."""
    if lp.ndim == 0:
        return lp
    # particle dim is the leftmost
    lead = lp.shape[0]
    if lead != num_particles:
        return jnp.sum(lp)
    return jnp.sum(lp.reshape(num_particles, -1), axis=-1)
