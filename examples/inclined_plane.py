"""Simulator-based inference: box sliding down an inclined plane.

Ref ``examples/inclined_plane.py``: infer the coefficient of friction mu
from noisy measurements of descent times, using importance sampling with
the Uniform prior as proposal.  The forward model is a numerical
integrator of the equations of motion.

TPU-native notes: the reference integrates with a data-dependent Python
``while`` loop per sample; here the integrator is a ``lax.while_loop``
so the whole simulator stays traceable, and the exercise at the bottom
of the reference ("vectorize the computations in this example!") is
done: all num_samples prior draws simulate in one vmap.

Run:  python examples/inclined_plane.py -n 500
"""

from __future__ import annotations

import argparse
import math

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import EmpiricalMarginal, Importance

little_g = 9.8  # m/s/s
mu0 = 0.12  # true coefficient of friction
time_measurement_sigma = 0.02  # known observation noise (seconds)


def simulate(mu, length=2.0, phi=math.pi / 6.0, dt=0.005):
    """Numerically integrate the equations of motion (ref :36-57)."""
    acceleration = little_g * math.sin(phi) - little_g * math.cos(
        phi
    ) * mu

    T_max = 100.0  # bound the loop: with acceleration <= 0 the box
    # never reaches the end (the reference early-returns, ref :44-46);
    # under vmap every lane must terminate, so we cap T instead.

    def cond(state):
        displacement, _, T = state
        return (displacement < length) & (T < T_max)

    def body(state):
        displacement, velocity, T = state
        return (
            displacement + velocity * dt,
            velocity + acceleration * dt,
            T + dt,
        )

    _, _, T = jax.lax.while_loop(
        cond, body, (jnp.zeros(()), jnp.zeros(()), jnp.zeros(()))
    )
    # the box doesn't slide at all if friction is too large (ref :44-46)
    return jnp.where(acceleration <= 0.0, 1.0e5, T)


def analytic_T(mu, length=2.0, phi=math.pi / 6.0):
    """Closed form the integrator approximates (ref :62-66)."""
    return math.sqrt(
        2.0 * length / (little_g * (math.sin(phi) - mu * math.cos(phi)))
    )


def model(observed_data):
    mu = pyro.sample("mu", dist.Uniform(0.0, 1.0))
    T_simulated = simulate(mu)
    with pyro.plate("data", observed_data.shape[0]):
        pyro.sample(
            "obs",
            dist.Normal(T_simulated, time_measurement_sigma),
            obs=observed_data,
        )
    return mu


def main(args):
    pyro.set_rng_seed(2)
    key = jax.random.key(2)
    print(
        "generating simulated data using the true coefficient of "
        f"friction {mu0:.3f}"
    )
    N_obs = 20
    T_true = simulate(jnp.asarray(mu0))
    observed_data = (
        T_true
        + time_measurement_sigma * jax.random.normal(key, (N_obs,))
    )
    observed_mean = float(observed_data.mean())

    importance = Importance(model, guide=None, num_samples=args.num_samples)
    print("doing importance sampling...")
    emp_marginal = EmpiricalMarginal(importance.run(observed_data))

    inferred_mu = float(emp_marginal.mean)
    inferred_mu_uncertainty = float(jnp.sqrt(emp_marginal.variance))
    print(
        f"the coefficient of friction inferred by pyro_tpu is "
        f"{inferred_mu:.3f} +- {inferred_mu_uncertainty:.3f}"
    )
    print(
        f"the mean observed descent time in the dataset is: "
        f"{observed_mean:.4f} seconds"
    )
    print(
        "the (forward) simulated descent time for the inferred (mean) "
        f"mu is: {float(simulate(jnp.asarray(inferred_mu))):.4f} seconds"
    )
    print(
        "disregarding measurement noise, elementary calculus gives the "
        f"descent time\nfor the inferred (mean) mu as: "
        f"{analytic_T(inferred_mu):.4f} seconds"
    )
    return inferred_mu


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="parse args")
    parser.add_argument("-n", "--num-samples", default=500, type=int)
    main(parser.parse_args())
