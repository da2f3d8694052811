"""Compartmental epidemiological models.

Ref ``pyro/contrib/epidemiology/compartmental.py:81`` (CompartmentalModel
with ``fit_svi:384`` and ``predict:663``).

Round-1 design: latent compartment *flows* are relaxed to positive reals
(the reference's ``fit_svi`` relaxed mode) and inferred with SVI over a
mean-field guide; ``transition`` is expressed per time step and unrolled
under ``pyro.markov``.  The quantized-NUTS mode is a later round.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from ... import poutine
from ...infer import SVI, Trace_ELBO
from ...infer.autoguide import AutoNormal
from ...optim import ClippedAdam


class CompartmentalModel:
    """Subclass and implement ``global_model``, ``initialize``, and
    ``transition`` (ref ``compartmental.py:81``)."""

    def __init__(self, compartments: List[str], duration: int, population: int):
        self.compartments = list(compartments)
        self.duration = duration
        self.population = population
        self.samples: Dict[str, jnp.ndarray] = {}

    # -- to implement ----------------------------------------------------------
    def global_model(self):
        return None

    def initialize(self, params) -> Dict[str, jnp.ndarray]:
        raise NotImplementedError

    def transition(self, params, state: Dict, t: int) -> Dict:
        raise NotImplementedError

    # -- inference ---------------------------------------------------------------
    def _model(self):
        params = self.global_model()
        state = {
            k: jnp.asarray(v, jnp.result_type(float))
            for k, v in self.initialize(params).items()
        }
        for t in pyro.markov(range(self.duration)):
            state = dict(state)
            self._t = t
            state = self.transition(params, state, t) or state
        return params

    def fit_svi(
        self,
        *,
        num_steps: int = 1001,
        learning_rate: float = 0.05,
        guide=None,
        rng_key=None,
        log_every: int = 0,
        **options,
    ):
        """Relaxed-flow SVI (ref ``compartmental.py:384``)."""
        guide = guide or AutoNormal(self._model, init_scale=0.05)
        svi = SVI(
            self._model,
            guide,
            ClippedAdam({"lr": learning_rate, "clip_norm": 10.0}),
            Trace_ELBO(),
        )
        # scanned hot path: all steps compile into ONE XLA launch
        losses = [float(x) for x in svi.run_steps(num_steps)]
        if log_every:
            for step in range(0, num_steps, log_every):
                print(f"step {step} loss = {losses[step]:.2f}")
        self.guide = guide
        return losses

    def predict(self, num_samples: int = 100, rng_key=None) -> Dict:
        """Posterior samples of all sites (ref ``compartmental.py:663``)."""
        from ...infer import Predictive

        pred = Predictive(
            self._model, guide=self.guide, num_samples=num_samples
        )
        self.samples = pred(rng_key=rng_key)
        return self.samples
