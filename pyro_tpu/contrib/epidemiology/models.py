"""Example compartmental models (ref
``pyro/contrib/epidemiology/models.py``).

All models are written against :func:`binomial_dist` /
:func:`infection_dist`, exactly as the reference's; under inference the
:class:`CompartmentalModel` base switches those helpers into relaxed mode
(moment-matched Normals over real-valued flows), which makes the whole
time-unrolled model smooth, reparameterized, and one jittable program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from .compartmental import CompartmentalModel
from .distributions import binomial_dist, infection_dist


class SimpleSIRModel(CompartmentalModel):
    """SIR with binomial observations of new infections
    (ref ``models.py:16``)."""

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
        S2I = pyro.sample(
            f"S2I_{t}",
            infection_dist(
                individual_rate=R0 / tau,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
            ),
        )
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"], 1 / tau)
        )
        new_state = {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
        }
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2I, rho),
            obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
        )
        return new_state

    def compute_flows(self, prev, curr, t):
        S2I = prev["S"] - curr["S"]
        I2R = prev["I"] - curr["I"] + S2I
        return {f"S2I_{t}": S2I, f"I2R_{t}": I2R}


class SimpleSEIRModel(CompartmentalModel):
    """SEIR with an incubation (Exposed) compartment
    (ref ``models.py:84``)."""

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
        return {"S": self.population - 1.0, "E": 0.0, "I": 1.0}

    def transition(self, params, state, t):
        R0, tau_e, tau_i, rho = params
        S2E = pyro.sample(
            f"S2E_{t}",
            infection_dist(
                individual_rate=R0 / tau_i,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
            ),
        )
        E2I = pyro.sample(
            f"E2I_{t}", binomial_dist(state["E"], 1 / tau_e)
        )
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"], 1 / tau_i)
        )
        new_state = {
            "S": state["S"] - S2E,
            "E": state["E"] + S2E - E2I,
            "I": state["I"] + E2I - I2R,
        }
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2E, rho),
            obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
        )
        return new_state


class SimpleSEIRDModel(CompartmentalModel):
    """SEIRD with a deceased compartment (ref ``models.py:162``)."""

    def __init__(
        self,
        population: int,
        incubation_time: float,
        recovery_time: float,
        mortality_rate: float,
        data,
    ):
        duration = len(data)
        super().__init__(["S", "E", "I", "D"], duration, population)
        assert incubation_time > 1 and recovery_time > 1
        assert 0 < mortality_rate < 1
        self.incubation_time = incubation_time
        self.recovery_time = recovery_time
        self.mortality_rate = mortality_rate
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau_e = self.incubation_time
        tau_i = self.recovery_time
        mu = self.mortality_rate
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        return R0, tau_e, tau_i, mu, rho

    def initialize(self, params):
        return {
            "S": self.population - 1.0,
            "E": 0.0,
            "I": 1.0,
            "D": 0.0,
        }

    def transition(self, params, state, t):
        R0, tau_e, tau_i, mu, rho = params
        S2E = pyro.sample(
            f"S2E_{t}",
            infection_dist(
                individual_rate=R0 / tau_i,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
            ),
        )
        E2I = pyro.sample(
            f"E2I_{t}", binomial_dist(state["E"], 1 / tau_e)
        )
        I2D = pyro.sample(
            f"I2D_{t}", binomial_dist(state["I"], mu / tau_i)
        )
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"] - I2D, 1 / tau_i)
        )
        new_state = {
            "S": state["S"] - S2E,
            "E": state["E"] + S2E - E2I,
            "I": state["I"] + E2I - I2R - I2D,
            "D": state["D"] + I2D,
        }
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2E, rho),
            obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
        )
        return new_state


class OverdispersedSIRModel(CompartmentalModel):
    """SIR with a learned global overdispersion parameter
    (ref ``models.py:275``)."""

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
        od = pyro.sample("od", dist.Beta(2.0, 6.0))
        return R0, tau, rho, od

    def initialize(self, params):
        return {"S": self.population - 1.0, "I": 1.0}

    def transition(self, params, state, t):
        R0, tau, rho, od = params
        S2I = pyro.sample(
            f"S2I_{t}",
            infection_dist(
                individual_rate=R0 / tau,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
                overdispersion=od,
            ),
        )
        I2R = pyro.sample(
            f"I2R_{t}",
            binomial_dist(state["I"], 1 / tau, overdispersion=od),
        )
        new_state = {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
        }
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2I, rho, overdispersion=od),
            obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
        )
        return new_state


class OverdispersedSEIRModel(CompartmentalModel):
    """SEIR with global overdispersion (ref ``models.py:367``)."""

    def __init__(
        self, population: int, incubation_time: float, recovery_time: float, data
    ):
        duration = len(data)
        super().__init__(["S", "E", "I"], duration, population)
        assert incubation_time > 1 and recovery_time > 1
        self.incubation_time = incubation_time
        self.recovery_time = recovery_time
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau_e = self.incubation_time
        tau_i = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        od = pyro.sample("od", dist.Beta(2.0, 6.0))
        return R0, tau_e, tau_i, rho, od

    def initialize(self, params):
        return {"S": self.population - 1.0, "E": 0.0, "I": 1.0}

    def transition(self, params, state, t):
        R0, tau_e, tau_i, rho, od = params
        S2E = pyro.sample(
            f"S2E_{t}",
            infection_dist(
                individual_rate=R0 / tau_i,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
                overdispersion=od,
            ),
        )
        E2I = pyro.sample(
            f"E2I_{t}",
            binomial_dist(state["E"], 1 / tau_e, overdispersion=od),
        )
        I2R = pyro.sample(
            f"I2R_{t}",
            binomial_dist(state["I"], 1 / tau_i, overdispersion=od),
        )
        new_state = {
            "S": state["S"] - S2E,
            "E": state["E"] + S2E - E2I,
            "I": state["I"] + E2I - I2R,
        }
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2E, rho, overdispersion=od),
            obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
        )
        return new_state


class SuperspreadingSIRModel(CompartmentalModel):
    """SIR with superspreading: each infectious individual infects
    BetaBinomial-many susceptibles, dispersion ``k`` (ref
    ``models.py:470``; Lloyd-Smith et al. 2005)."""

    def __init__(self, population: int, recovery_time: float, data):
        duration = len(data)
        super().__init__(["S", "I"], duration, population)
        assert recovery_time > 1
        self.recovery_time = recovery_time
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        k = pyro.sample("k", dist.Exponential(1.0))
        rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        return R0, k, tau, rho

    def initialize(self, params):
        return {"S": self.population - 1.0, "I": 1.0}

    def transition(self, params, state, t):
        R0, k, tau, rho = params
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"], 1 / tau)
        )
        S2I = pyro.sample(
            f"S2I_{t}",
            infection_dist(
                individual_rate=R0,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
                concentration=k,
            ),
        )
        new_state = {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
        }
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2I, rho),
            obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
        )
        return new_state


class HeterogeneousSIRModel(CompartmentalModel):
    """SIR with time-varying Rt (log-Brownian drift) and piecewise
    response rate (ref ``models.py:696``)."""

    def __init__(self, population: int, recovery_time: float, data):
        duration = len(data)
        super().__init__(["S", "I"], duration, population)
        assert recovery_time > 1
        self.recovery_time = recovery_time
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        rho0 = pyro.sample("rho0", dist.Beta(2.0, 4.0))
        rho1 = pyro.sample("rho1", dist.Beta(4.0, 4.0))
        rho2 = pyro.sample("rho2", dist.Beta(8.0, 4.0))
        d = self.duration
        n0 = min(14, d)
        n1 = min(7, max(d - n0, 0))
        n2 = max(d - n0 - n1, 0)
        rho = jnp.concatenate(
            [
                jnp.broadcast_to(rho0[..., None], rho0.shape + (n0,)),
                jnp.broadcast_to(rho1[..., None], rho1.shape + (n1,)),
                jnp.broadcast_to(rho2[..., None], rho2.shape + (n2,)),
            ],
            axis=-1,
        )
        pyro.deterministic("rho", rho, event_dim=1)
        return R0, tau, rho

    def initialize(self, params):
        return {
            "S": self.population - 1.0,
            "I": 1.0,
            "beta": jnp.asarray(1.0),
        }

    def transition(self, params, state, t):
        R0, tau, rho = params
        beta = pyro.sample(
            f"beta_{t}",
            dist.LogNormal(jnp.log(jnp.clip(state["beta"], 1e-6)), 0.1),
        )
        Rt = pyro.deterministic(f"Rt_{t}", R0 * beta)
        S2I = pyro.sample(
            f"S2I_{t}",
            infection_dist(
                individual_rate=Rt / tau,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
            ),
        )
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"], 1 / tau)
        )
        new_state = {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
            "beta": beta,
        }
        t_obs = isinstance(t, slice) or t < self.duration
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2I, rho[..., min(t, rho.shape[-1] - 1) if isinstance(t, int) else t]),
            obs=self.data[t] if t_obs else None,
        )
        return new_state


class RegionalSIRModel(CompartmentalModel):
    """SIR over multiple coupled regions: infections mix across regions
    via a coupling matrix (ref ``models.py:1022``).  The region axis is a
    plate — on TPU it vectorizes, and sharding that axis over a mesh
    scales to many regions."""

    def __init__(self, population, coupling, recovery_time: float, data):
        population = jnp.asarray(population, jnp.result_type(float))
        coupling = jnp.asarray(coupling, jnp.result_type(float))
        duration = len(data)
        num_regions = population.shape[0]
        assert coupling.shape == (num_regions, num_regions)
        assert recovery_time > 1
        super().__init__(
            ["S", "I"], duration, population, approximate=("I",)
        )
        self.coupling = coupling
        self.recovery_time = recovery_time
        self.num_regions = num_regions
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        with self.region_plate:
            rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        return R0, tau, rho

    def initialize(self, params):
        return {
            "S": self.population - 1.0,
            "I": jnp.ones(self.num_regions),
        }

    def transition(self, params, state, t):
        R0, tau, rho = params
        # Couple infectious counts across regions: cross-region terms use
        # the non-enumerated point estimate I_approx, own-region uses the
        # exact (possibly enumerated) count (ref ``models.py:1085-1090``)
        I_approx = state.get("I_approx", state["I"])
        I_coupled = I_approx @ self.coupling
        I_coupled = I_coupled + (state["I"] - I_approx) * jnp.diagonal(
            self.coupling
        )
        I_coupled = jnp.clip(I_coupled, 0.0)
        pop_coupled = self.population @ self.coupling
        with self.region_plate:
            S2I = pyro.sample(
                f"S2I_{t}",
                infection_dist(
                    individual_rate=R0 / tau,
                    num_susceptible=state["S"],
                    num_infectious=I_coupled,
                    population=pop_coupled,
                ),
            )
            I2R = pyro.sample(
                f"I2R_{t}", binomial_dist(state["I"], 1 / tau)
            )
            pyro.sample(
                f"obs_{t}",
                binomial_dist(S2I, rho),
                obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
            )
        return {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
        }

    def compute_flows(self, prev, curr, t):
        S2I = prev["S"] - curr["S"]
        I2R = prev["I"] - curr["I"] + S2I
        return {f"S2I_{t}": S2I, f"I2R_{t}": I2R}


class SparseSIRModel(CompartmentalModel):
    """SIR with sparse observations of CUMULATIVE infections via an
    auxiliary observed-count compartment ``O`` (ref ``models.py:797``).

    The reference notes its Delta observation is incompatible with
    relaxed inference; in relaxed mode we use a tight Normal(O, 0.5)
    soft constraint instead.
    """

    def __init__(self, population: int, recovery_time: float, data, mask):
        assert len(data) == len(mask)
        duration = len(data)
        super().__init__(["S", "I", "O"], duration, population)
        assert recovery_time > 1
        self.recovery_time = recovery_time
        self.data = jnp.asarray(data, jnp.result_type(float))
        self.mask = jnp.asarray(mask, bool)

    def global_model(self):
        tau = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        return R0, tau, rho

    def initialize(self, params):
        return {"S": self.population - 1.0, "I": 1.0, "O": 0.0}

    def transition(self, params, state, t):
        R0, tau, rho = params
        S2I = pyro.sample(
            f"S2I_{t}",
            infection_dist(
                individual_rate=R0 / tau,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
            ),
        )
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"], 1 / tau)
        )
        S2O = pyro.sample(f"S2O_{t}", binomial_dist(S2I, rho))
        new_state = {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
            "O": state["O"] + S2O,
        }
        # cumulative observation; soft Delta in relaxed mode
        from pyro_tpu import poutine

        mask_t = (
            self.mask[t]
            if (isinstance(t, slice) or t < self.duration)
            else False
        )
        with poutine.mask(mask=mask_t):
            pyro.sample(
                f"obs_{t}",
                dist.Normal(new_state["O"], 0.5),
                obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
            )
        return new_state

    def compute_flows(self, prev, curr, t):
        S2I = prev["S"] - curr["S"]
        I2R = prev["I"] - curr["I"] + S2I
        S2O = curr["O"] - prev["O"]
        return {
            f"S2I_{t}": S2I,
            f"I2R_{t}": I2R,
            f"S2O_{t}": S2O,
        }


class UnknownStartSIRModel(CompartmentalModel):
    """SIR with unknown date of first infection: a pre-observation window
    with a constant external infection rate and a lower response rate
    (ref ``models.py:892``)."""

    def __init__(
        self, population: int, recovery_time: float, pre_obs_window: int, data
    ):
        duration = pre_obs_window + len(data)
        super().__init__(["S", "I"], duration, population)
        assert recovery_time > 1
        assert isinstance(pre_obs_window, int) and pre_obs_window > 0
        self.recovery_time = recovery_time
        self.pre_obs_window = pre_obs_window
        self.post_obs_window = len(data)
        # on average one external infection during the pre-window
        self.external_rate = 1.0 / pre_obs_window
        self.data = jnp.concatenate(
            [
                jnp.zeros(pre_obs_window),
                jnp.asarray(data, jnp.result_type(float)),
            ]
        )

    def global_model(self):
        tau = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        rho0 = pyro.sample("rho0", dist.Beta(10.0, 10.0))
        rho1 = pyro.sample("rho1", dist.Beta(10.0, 10.0))
        rho = jnp.concatenate(
            [
                jnp.broadcast_to(
                    rho0[..., None], rho0.shape + (self.pre_obs_window,)
                ),
                jnp.broadcast_to(
                    rho1[..., None], rho1.shape + (self.post_obs_window,)
                ),
            ],
            axis=-1,
        )
        # external infections as an infectious pseudo-individual
        X = self.external_rate * tau / R0
        return R0, X, tau, rho

    def initialize(self, params):
        return {"S": float(self.population), "I": 0.0}

    def transition(self, params, state, t):
        R0, X, tau, rho = params
        S2I = pyro.sample(
            f"S2I_{t}",
            infection_dist(
                individual_rate=R0 / tau,
                num_susceptible=state["S"],
                num_infectious=state["I"] + X,
                population=self.population,
            ),
        )
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"], 1 / tau)
        )
        new_state = {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
        }
        t_obs = isinstance(t, slice) or t < self.duration
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2I, rho[..., min(t, rho.shape[-1] - 1) if isinstance(t, int) else t]),
            obs=self.data[t] if t_obs else None,
        )
        return new_state


class SuperspreadingSEIRModel(CompartmentalModel):
    """SEIR with superspreading and an optional phylogenetic likelihood
    over coalescent times of viral genomes (ref ``models.py:560``)."""

    def __init__(
        self,
        population: int,
        incubation_time: float,
        recovery_time: float,
        data,
        *,
        leaf_times=None,
        coal_times=None,
    ):
        duration = len(data)
        super().__init__(["S", "E", "I"], duration, population)
        assert incubation_time > 1 and recovery_time > 1
        self.incubation_time = incubation_time
        self.recovery_time = recovery_time
        self.data = jnp.asarray(data, jnp.result_type(float))
        assert (leaf_times is None) == (coal_times is None)
        if leaf_times is None:
            self.coal_likelihood = None
        else:
            from ...distributions import CoalescentRateLikelihood

            self.coal_likelihood = CoalescentRateLikelihood(
                leaf_times, coal_times, duration
            )

    def global_model(self):
        tau_e = self.incubation_time
        tau_i = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        k = pyro.sample("k", dist.Exponential(1.0))
        rho = pyro.sample("rho", dist.Beta(10.0, 10.0))
        return R0, k, tau_e, tau_i, rho

    def initialize(self, params):
        return {"S": self.population - 1.0, "E": 0.0, "I": 1.0}

    def transition(self, params, state, t):
        R0, k, tau_e, tau_i, rho = params
        E2I = pyro.sample(
            f"E2I_{t}", binomial_dist(state["E"], 1 / tau_e)
        )
        I2R = pyro.sample(
            f"I2R_{t}", binomial_dist(state["I"], 1 / tau_i)
        )
        S2E = pyro.sample(
            f"S2E_{t}",
            infection_dist(
                individual_rate=R0,
                num_susceptible=state["S"],
                num_infectious=state["I"],
                population=self.population,
                concentration=k,
            ),
        )
        pyro.sample(
            f"obs_{t}",
            binomial_dist(S2E, rho),
            obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
        )
        if self.coal_likelihood is not None and t < self.duration:
            R = R0 * state["S"] / self.population
            coal_rate = R * (1.0 + 1.0 / k) / (
                tau_i * state["I"] + 1e-8
            )
            pyro.factor(
                f"coalescent_{t}",
                self.coal_likelihood(coal_rate, t),
            )
        return {
            "S": state["S"] - S2E,
            "E": state["E"] + S2E - E2I,
            "I": state["I"] + E2I - I2R,
        }


class HeterogeneousRegionalSIRModel(CompartmentalModel):
    """Regional SIR with time-varying Rt (shared across regions) and
    time-and-region-varying response rate, both drifting as transformed
    Brownian motion with learned drift rates (ref ``models.py:1144``)."""

    def __init__(self, population, coupling, recovery_time: float, data):
        population = jnp.asarray(population, jnp.result_type(float))
        coupling = jnp.asarray(coupling, jnp.result_type(float))
        duration = len(data)
        num_regions = population.shape[0]
        assert coupling.shape == (num_regions, num_regions)
        assert recovery_time > 1
        super().__init__(
            ["S", "I"], duration, population, approximate=("I",)
        )
        self.coupling = coupling
        self.recovery_time = recovery_time
        self.num_regions = num_regions
        self.data = jnp.asarray(data, jnp.result_type(float))

    def global_model(self):
        tau = self.recovery_time
        R0 = pyro.sample("R0", dist.LogNormal(0.0, 1.0))
        R_drift = pyro.sample("R_drift", dist.LogNormal(-3.0, 1.0))
        with self.region_plate:
            rho0 = pyro.sample("rho0", dist.Beta(4.0, 4.0))
        rho_drift = pyro.sample("rho_drift", dist.LogNormal(-3.0, 1.0))
        return tau, R0, R_drift, rho0, rho_drift

    def initialize(self, params):
        I = jnp.zeros(self.num_regions).at[0].add(1.0)
        return {
            "S": self.population - I,
            "I": I,
            "R_factor": jnp.asarray(1.0),
            "rho_shift": jnp.zeros(self.num_regions),
        }

    def transition(self, params, state, t):
        tau, R0, R_drift, rho0, rho_drift = params
        I_approx = state.get("I_approx", state["I"])
        I_coupled = I_approx @ self.coupling
        I_coupled = I_coupled + (state["I"] - I_approx) * jnp.diagonal(
            self.coupling
        )
        I_coupled = jnp.clip(I_coupled, 0.0)
        pop_coupled = self.population @ self.coupling

        R_factor = pyro.sample(
            f"R_factor_{t}",
            dist.LogNormal(
                jnp.log(jnp.clip(state["R_factor"], 1e-6)), R_drift
            ),
        )
        Rt = pyro.deterministic(f"Rt_{t}", R0 * R_factor)

        with self.region_plate:
            rho_shift = pyro.sample(
                f"rho_shift_{t}",
                dist.Normal(state["rho_shift"], rho_drift),
            )
            # event_dim=0: the region axis is the plate's batch dim
            rho = pyro.deterministic(
                f"rho_{t}",
                jax.nn.sigmoid(
                    jnp.log(rho0) - jnp.log1p(-rho0) + rho_shift
                ),
                event_dim=0,
            )
            S2I = pyro.sample(
                f"S2I_{t}",
                infection_dist(
                    individual_rate=Rt / tau,
                    num_susceptible=state["S"],
                    num_infectious=I_coupled,
                    population=pop_coupled,
                ),
            )
            I2R = pyro.sample(
                f"I2R_{t}", binomial_dist(state["I"], 1 / tau)
            )
            pyro.sample(
                f"obs_{t}",
                binomial_dist(S2I, rho),
                obs=self.data[t]
            if (isinstance(t, slice) or t < self.duration)
            else None,
            )
        return {
            "S": state["S"] - S2I,
            "I": state["I"] + S2I - I2R,
            "R_factor": R_factor,
            "rho_shift": rho_shift,
        }
