"""Example compartmental models (ref
``pyro/contrib/epidemiology/models.py``)."""

from __future__ import annotations

import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from .compartmental import CompartmentalModel
from .distributions import binomial_dist, infection_dist


class SimpleSEIRModel(CompartmentalModel):
    """SEIR with an incubation (Exposed) compartment
    (ref ``models.py:SimpleSEIRModel``), relaxed to positive real flows."""

    def __init__(
        self, population: int, incubation_time: float, recovery_time: float, data
    ):
        duration = len(data)
        super().__init__(["S", "E", "I"], duration, population)
        assert incubation_time > 1
        assert recovery_time > 1
        self.incubation_time = incubation_time
        self.recovery_time = recovery_time
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau_e = self.incubation_time
        tau_i = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        return R0, tau_e, tau_i, rho

    def initialize(self, params):
        return {
            "S": self.population - 1.0,
            "E": 0.0,
            "I": 1.0,
        }

    def transition(self, params, state, t):
        R0, tau_e, tau_i, rho = params
        p_infect = 1.0 - jnp.exp(
            -R0 / tau_i * state["I"] / self.population
        )
        mean_s2e = jnp.clip(state["S"] * p_infect, 1e-3)
        S2E = pyro.sample(
            f"S2E_{t}", dist.LogNormal(jnp.log(mean_s2e), 0.3)
        )
        mean_e2i = jnp.clip(state["E"] / tau_e, 1e-3)
        E2I = pyro.sample(
            f"E2I_{t}", dist.LogNormal(jnp.log(mean_e2i), 0.3)
        )
        mean_i2r = jnp.clip(state["I"] / tau_i, 1e-3)
        I2R = pyro.sample(
            f"I2R_{t}", dist.LogNormal(jnp.log(mean_i2r), 0.3)
        )
        S2E = jnp.clip(S2E, 0.0, state["S"])
        E2I = jnp.clip(E2I, 0.0, state["E"])
        I2R = jnp.clip(I2R, 0.0, state["I"])
        new_state = {
            "S": state["S"] - S2E,
            "E": state["E"] + S2E - E2I,
            "I": state["I"] + E2I - I2R,
        }
        n = S2E + 0.5
        pyro.sample(
            f"obs_{t}",
            dist.Normal(rho * n, jnp.sqrt(rho * (1 - rho) * n + 0.5)),
            obs=self.data[t],
        )
        return new_state


class SimpleSIRModel(CompartmentalModel):
    """SIR with binomial observations of new infections
    (ref ``models.py:SimpleSIRModel``), relaxed to positive real flows."""

    def __init__(self, population: int, recovery_time: float, data):
        duration = len(data)
        super().__init__(["S", "I"], duration, population)
        assert recovery_time > 1
        self.recovery_time = recovery_time
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        return R0, tau, rho

    def initialize(self, params):
        return {"S": self.population - 1.0, "I": 1.0}

    def transition(self, params, state, t):
        R0, tau, rho = params
        # relaxed flows: LogNormal moment-matched to the binomial flows
        p_infect = 1.0 - jnp.exp(
            -R0 / tau * state["I"] / self.population
        )
        mean_s2i = jnp.clip(state["S"] * p_infect, 1e-3)
        S2I = pyro.sample(
            f"S2I_{t}",
            dist.LogNormal(jnp.log(mean_s2i), 0.3),
        )
        mean_i2r = jnp.clip(state["I"] / tau, 1e-3)
        I2R = pyro.sample(
            f"I2R_{t}",
            dist.LogNormal(jnp.log(mean_i2r), 0.3),
        )
        S2I = jnp.clip(S2I, 0.0, state["S"])
        I2R = jnp.clip(I2R, 0.0, state["I"])
        new_state = {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
        }
        # moment-matched smooth binomial likelihood (relaxed mode: a
        # differentiable stand-in for Binomial(S2I, rho); ref fit_svi's
        # relaxed=True path)
        n = S2I + 0.5
        pyro.sample(
            f"obs_{t}",
            dist.Normal(
                rho * n, jnp.sqrt(rho * (1 - rho) * n + 0.5)
            ),
            obs=self.data[t],
        )
        return new_state
