"""SIR epidemiology with HMC/NUTS (ref ``examples/sir_hmc.py``).

The reference quantizes discrete flows for enumeration-in-NUTS; here the
flows are relaxed to positive reals (the same relaxation the reference's
``fit_svi`` uses), making the whole posterior HMC-tractable: NUTS runs
as one jitted ``while_loop`` chain over the unconstrained flow vector.

Run: ``python examples/sir_hmc.py --population 1000 -n 200``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
from pyro_tpu.contrib.epidemiology import SimpleSIRModel


def generate_data(args):
    rng = np.random.RandomState(args.seed)
    S, I = args.population - args.initial_infected, float(
        args.initial_infected
    )
    data = []
    for _ in range(args.duration):
        p = 1 - np.exp(-args.R0 / args.recovery_time * I / args.population)
        s2i = rng.binomial(int(S), p)
        i2r = rng.binomial(int(I), 1 / args.recovery_time)
        S -= s2i
        I += s2i - i2r
        data.append(rng.binomial(max(s2i, 1), args.response_rate))
    return jnp.asarray(data, jnp.float32)


def main(args):
    pyro.set_rng_seed(args.seed)
    data = generate_data(args)
    print(f"observed new infections: {np.asarray(data).astype(int).tolist()}")

    model = SimpleSIRModel(args.population, args.recovery_time, data)
    mcmc = model.fit_mcmc(
        num_samples=args.num_samples,
        warmup_steps=args.warmup_steps,
        num_chains=args.num_chains,
        rng_key=jax.random.key(args.seed),
    )
    mcmc.summary()
    R0 = np.asarray(model.samples["R0"])
    rho = np.asarray(model.samples["rho"])
    print(
        f"R0: median {np.median(R0):.2f} (true {args.R0}); "
        f"rho: median {np.median(rho):.2f} (true {args.response_rate})"
    )
    return model


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="SIR with NUTS")
    p.add_argument("--population", default=1000, type=int)
    p.add_argument("--initial-infected", default=5, type=int)
    p.add_argument("--duration", default=20, type=int)
    p.add_argument("--R0", default=2.0, type=float)
    p.add_argument("--recovery-time", default=4.0, type=float)
    p.add_argument("--response-rate", default=0.5, type=float)
    p.add_argument("-n", "--num-samples", default=200, type=int)
    p.add_argument("-w", "--warmup-steps", default=200, type=int)
    p.add_argument("--num-chains", default=1, type=int)
    p.add_argument("--seed", default=1, type=int)
    main(p.parse_args())
