"""Hierarchical mixed-effects hidden Markov model (momentuHMM-style).

Ref ``examples/mixed_hmm/{model,experiment,seal_data}.py``: an HMM over
animal movement states with group-level and individual-level random
effects (each independently none / "discrete" / "continuous"), and three
zero-inflated observation channels per timestep: step length (Gamma),
turn angle (VonMises) and dive activity (Beta), with missingness handled
by MaskedMixture against a point mass (ref ``model.py:120-272``).

Discrete random effects and the latent state sequence are marginalized
exactly by TraceEnum_ELBO with ``pyro.markov`` dim recycling; continuous
random effects use the generic mean-field guide (ref ``model.py:14-67``).
Synthetic harbour-seal-like data stands in for the momentuHMM dataset.

Run:  python examples/mixed_hmm.py --group discrete --individual none
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, TraceEnum_ELBO, config_enumerate
from pyro_tpu.ops.indexing import Vindex
from pyro_tpu.optim import Adam

MISSING = 1e-6


def guide_generic(config):
    """Generic mean-field guide for continuous random effects (ref :14-67)."""
    N_state = config["sizes"]["state"]
    N_c = config["sizes"]["group"]

    if config["group"]["random"] == "continuous":
        loc_g = pyro.param("loc_group", jnp.zeros(N_state**2))
        scale_g = pyro.param(
            "scale_group",
            jnp.ones(N_state**2),
            constraint=constraints.positive,
        )
    if config["individual"]["random"] == "continuous":
        loc_i = pyro.param(
            "loc_individual", jnp.zeros((N_c, N_state**2))
        )
        scale_i = pyro.param(
            "scale_individual",
            jnp.ones((N_c, N_state**2)),
            constraint=constraints.positive,
        )

    with pyro.plate("group", N_c, dim=-1):
        if config["group"]["random"] == "continuous":
            pyro.sample("eps_g", dist.Normal(loc_g, scale_g).to_event(1))
        N_s = config["sizes"]["individual"]
        with pyro.plate("individual", N_s, dim=-2), poutine.mask(
            mask=config["individual"]["mask"]
        ):
            if config["individual"]["random"] == "continuous":
                pyro.sample(
                    "eps_i", dist.Normal(loc_i, scale_i).to_event(1)
                )


@config_enumerate
def model_generic(config):
    """Hierarchical mixed-effects HMM (ref ``model.py:69-272``)."""
    N_v = config["sizes"]["random"]
    N_state = config["sizes"]["state"]
    N_c = config["sizes"]["group"]

    if config["group"]["random"] == "discrete":
        probs_e_g = pyro.param(
            "probs_e_group",
            jnp.ones(N_v) / N_v,
            constraint=constraints.simplex,
        )
        theta_g = pyro.param(
            "theta_group", 0.1 * jnp.arange(N_v * N_state**2).reshape(N_v, -1)
        )
    elif config["group"]["random"] == "continuous":
        loc_g = jnp.zeros(N_state**2)
        scale_g = jnp.ones(N_state**2)

    if config["individual"]["random"] == "discrete":
        probs_e_i = pyro.param(
            "probs_e_individual",
            jnp.ones((N_c, N_v)) / N_v,
            constraint=constraints.simplex,
        )
        theta_i = pyro.param(
            "theta_individual", jnp.zeros((N_c, N_v, N_state**2))
        )
    elif config["individual"]["random"] == "continuous":
        loc_i = jnp.zeros((N_c, N_state**2))
        scale_i = jnp.ones((N_c, N_state**2))

    # observation channel parameters (ref :120-152)
    step_zi_param = pyro.param("step_zi_param", jnp.ones((N_state, 2)))
    step_concentration = pyro.param(
        "step_param_concentration",
        jnp.ones(N_state),
        constraint=constraints.positive,
    )
    step_rate = pyro.param(
        "step_param_rate",
        jnp.ones(N_state),
        constraint=constraints.positive,
    )
    angle_concentration = pyro.param(
        "angle_param_concentration",
        jnp.ones(N_state),
        constraint=constraints.positive,
    )
    angle_loc = pyro.param("angle_param_loc", jnp.zeros(N_state))
    omega_zi_param = pyro.param("omega_zi_param", jnp.ones((N_state, 2)))
    omega_concentration0 = pyro.param(
        "omega_param_concentration0",
        jnp.ones(N_state),
        constraint=constraints.positive,
    )
    omega_concentration1 = pyro.param(
        "omega_param_concentration1",
        jnp.ones(N_state),
        constraint=constraints.positive,
    )

    gamma = jnp.zeros(N_state**2)

    with pyro.plate("group", N_c, dim=-1):
        if config["group"]["random"] == "discrete":
            e_g = pyro.sample("e_g", dist.Categorical(probs_e_g))
            eps_g = Vindex(theta_g)[..., e_g, :]
        elif config["group"]["random"] == "continuous":
            eps_g = pyro.sample(
                "eps_g", dist.Normal(loc_g, scale_g).to_event(1)
            )
        else:
            eps_g = 0.0
        gamma = gamma + eps_g

        N_s = config["sizes"]["individual"]
        with pyro.plate("individual", N_s, dim=-2), poutine.mask(
            mask=config["individual"]["mask"]
        ):
            if config["individual"]["random"] == "discrete":
                e_i = pyro.sample("e_i", dist.Categorical(probs_e_i))
                eps_i = Vindex(theta_i)[..., e_i, :]
            elif config["individual"]["random"] == "continuous":
                eps_i = pyro.sample(
                    "eps_i", dist.Normal(loc_i, scale_i).to_event(1)
                )
            else:
                eps_i = 0.0
            gamma = gamma + eps_i

            y = jnp.zeros((), dtype=jnp.int32)
            N_t = config["sizes"]["timesteps"]
            for t in pyro.markov(range(N_t)):
                with poutine.mask(
                    mask=config["timestep"]["mask"][..., t]
                ):
                    gamma_t = gamma.reshape(
                        gamma.shape[:-1] + (N_state, N_state)
                    )
                    gamma_y = Vindex(gamma_t)[..., y, :]
                    y = pyro.sample(
                        f"y_{t}", dist.Categorical(logits=gamma_y)
                    )

                    # observation 1: zero-inflated step length
                    step_dist = dist.Gamma(
                        Vindex(step_concentration)[..., y],
                        Vindex(step_rate)[..., y],
                    )
                    step_obs = config["observations"]["step"][..., t]
                    step_zi_mask = step_obs == MISSING
                    pyro.sample(
                        f"step_zi_{t}",
                        dist.Categorical(
                            logits=Vindex(step_zi_param)[..., y, :]
                        ),
                        obs=step_zi_mask.astype(jnp.int32),
                    )
                    pyro.sample(
                        f"step_{t}",
                        dist.MaskedMixture(
                            step_zi_mask,
                            step_dist,
                            dist.Delta(jnp.asarray(MISSING)),
                        ),
                        obs=step_obs,
                    )

                    # observation 2: turn angle
                    pyro.sample(
                        f"angle_{t}",
                        dist.VonMises(
                            Vindex(angle_loc)[..., y],
                            Vindex(angle_concentration)[..., y],
                        ),
                        obs=config["observations"]["angle"][..., t],
                    )

                    # observation 3: zero-inflated dive activity
                    omega_dist = dist.Beta(
                        Vindex(omega_concentration1)[..., y],
                        Vindex(omega_concentration0)[..., y],
                    )
                    omega_obs = config["observations"]["omega"][..., t]
                    omega_zi_mask = omega_obs == MISSING
                    pyro.sample(
                        f"omega_zi_{t}",
                        dist.Categorical(
                            logits=Vindex(omega_zi_param)[..., y, :]
                        ),
                        obs=omega_zi_mask.astype(jnp.int32),
                    )
                    pyro.sample(
                        f"omega_{t}",
                        dist.MaskedMixture(
                            omega_zi_mask,
                            omega_dist,
                            dist.Delta(jnp.asarray(MISSING)),
                        ),
                        obs=omega_obs,
                    )


def synthetic_seal_config(
    key,
    group="discrete",
    individual="none",
    n_groups=2,
    n_individuals=3,
    n_timesteps=15,
    n_state=2,
    n_random=2,
):
    """Synthetic stand-in for the momentuHMM harbour-seal dataset."""
    ks = jax.random.split(key, 4)
    step = jax.random.gamma(ks[0], 2.0, (n_individuals, n_groups, n_timesteps))
    angle = (
        jax.random.uniform(ks[1], (n_individuals, n_groups, n_timesteps))
        * 2
        * jnp.pi
        - jnp.pi
    )
    omega = jax.random.beta(
        ks[2], 2.0, 3.0, (n_individuals, n_groups, n_timesteps)
    )
    # inject missingness
    miss = jax.random.uniform(ks[3], step.shape) < 0.1
    step = jnp.where(miss, MISSING, step)
    omega = jnp.where(miss, MISSING, omega)
    return {
        "MISSING": MISSING,
        "sizes": {
            "state": n_state,
            "random": n_random,
            "group": n_groups,
            "individual": n_individuals,
            "timesteps": n_timesteps,
        },
        "group": {"random": group},
        "individual": {
            "random": individual,
            "mask": jnp.ones((n_individuals, n_groups), bool),
        },
        "timestep": {
            "mask": jnp.ones((n_individuals, n_groups, n_timesteps), bool)
        },
        "observations": {"step": step, "angle": angle, "omega": omega},
    }


def main(args):
    pyro.set_rng_seed(args.seed)
    config = synthetic_seal_config(
        jax.random.key(args.seed),
        group=args.group,
        individual=args.individual,
        n_timesteps=args.timesteps,
    )
    elbo = TraceEnum_ELBO(max_plate_nesting=2)
    svi = SVI(
        lambda: model_generic(config),
        lambda: guide_generic(config),
        Adam({"lr": args.learning_rate}),
        elbo,
    )
    losses = svi.run_steps(args.num_steps)
    print(
        f"loss: first={float(losses[0]):.2f} last={float(losses[-1]):.2f}"
    )
    return float(losses[-1])


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument(
        "--group", default="discrete",
        choices=["none", "discrete", "continuous"],
    )
    p.add_argument(
        "--individual", default="none",
        choices=["none", "discrete", "continuous"],
    )
    p.add_argument("--timesteps", type=int, default=15)
    p.add_argument("--num-steps", type=int, default=100)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
