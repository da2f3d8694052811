"""Regional SIR epidemiology: coupled regions, vectorized on TPU.

Ref ``examples/contrib/epidemiology/regional.py``: simulate an epidemic
over several coupled regions from a RegionalSIRModel prior, infer
R0/rho, and forecast.  The region axis is a plate — it vectorizes on one
chip and can be sharded over a mesh axis for many-region models.

Run:  python examples/epidemiology_regional.py --duration 16 --forecast 4
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
from pyro_tpu.contrib.epidemiology.models import RegionalSIRModel


def make_model(args, data):
    assert 0 <= args.coupling <= 1, args.coupling
    population = jnp.full((args.num_regions,), float(args.population))
    coupling = jnp.clip(
        jnp.eye(args.num_regions), a_min=args.coupling
    )
    return RegionalSIRModel(
        population, coupling, args.recovery_time, data
    )


def generate_data(args):
    """Simulate from the prior until enough infections are observed
    (ref regional.py:22-50)."""
    extended = make_model(
        args, jnp.zeros((args.duration + args.forecast, args.num_regions))
    )
    for attempt in range(100):
        pyro.set_rng_seed(args.seed + attempt)
        sample = extended.generate(
            {
                "R0": args.basic_reproduction_number,
                "rho": jnp.full(
                    (args.num_regions,), args.response_rate
                ),
            }
        )
        obs = jnp.stack(
            [
                sample[f"obs_{t}"]
                for t in range(args.duration + args.forecast)
            ]
        )
        n_obs = float(obs[: args.duration].sum())
        if n_obs >= args.min_observations:
            print(
                "observed %d infections over %d regions during the "
                "inference window" % (int(n_obs), args.num_regions)
            )
            return obs
    raise RuntimeError("failed to generate a plausible epidemic")


def main(args):
    obs = generate_data(args)
    model = make_model(args, obs[: args.duration])

    if args.mcmc:
        model.fit_mcmc(
            num_samples=args.num_samples,
            warmup_steps=args.warmup,
            num_chains=args.num_chains,
        )
    else:
        losses = model.fit_svi(
            num_steps=args.num_steps,
            learning_rate=args.learning_rate,
            num_particles=args.num_particles,
        )
        print(
            "svi loss: first=%.1f last=%.1f"
            % (float(losses[0]), float(losses[-1]))
        )

    samples = model.predict(forecast=args.forecast)
    r0 = np.asarray(samples["R0"])
    print(
        "inferred R0: %.2f +- %.2f (true %.2f)"
        % (r0.mean(), r0.std(), args.basic_reproduction_number)
    )
    return float(r0.mean())


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="Regional SIR epidemiology modeling"
    )
    p.add_argument("--num-regions", type=int, default=3)
    p.add_argument("--coupling", type=float, default=0.1)
    p.add_argument("--population", type=int, default=1000)
    p.add_argument("--recovery-time", type=float, default=7.0)
    p.add_argument("--basic-reproduction-number", type=float, default=1.5)
    p.add_argument("--response-rate", type=float, default=0.5)
    p.add_argument("--duration", type=int, default=16)
    p.add_argument("--forecast", type=int, default=4)
    p.add_argument("--min-observations", type=int, default=3)
    p.add_argument("--mcmc", action="store_true")
    p.add_argument("--num-steps", type=int, default=500)
    p.add_argument("--num-particles", type=int, default=4)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--num-chains", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
