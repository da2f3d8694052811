"""Eight schools via NUTS (ref ``examples/eight_schools/mcmc.py``)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import MCMC, NUTS

Y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
SIGMA = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])


def model(y, sigma):
    mu = pyro.sample("mu", dist.Normal(0.0, 5.0))
    tau = pyro.sample("tau", dist.HalfCauchy(5.0))
    with pyro.plate("J", y.shape[0]):
        eta = pyro.sample("eta", dist.Normal(0.0, 1.0))
        theta = pyro.deterministic("theta", mu + tau * eta)
        pyro.sample("obs", dist.Normal(theta, sigma), obs=y)


def main(args):
    mcmc = MCMC(
        NUTS(model),
        num_samples=args.num_samples,
        warmup_steps=args.warmup_steps,
        num_chains=args.num_chains,
    )
    mcmc.run(Y, SIGMA, rng_key=jax.random.key(args.seed))
    mcmc.summary()
    return mcmc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=1000)
    p.add_argument("--warmup-steps", type=int, default=1000)
    p.add_argument("--num-chains", type=int, default=4)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
