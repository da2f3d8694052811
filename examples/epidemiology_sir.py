"""SIR epidemiology: generate, infer, forecast.

Ref ``examples/contrib/epidemiology/sir.py``: simulate an epidemic from a
SimpleSIRModel, infer R0/rho with either SVI (relaxed flows) or MCMC, and
forecast future new infections, evaluating forecast coverage.

Run:  python examples/epidemiology_sir.py --duration 20 --forecast 10
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
from pyro_tpu.contrib.epidemiology import SimpleSIRModel


def generate_data(args):
    """Simulate from the prior until an epidemic of reasonable size
    (ref sir.py:46-73)."""
    extended = SimpleSIRModel(
        args.population,
        args.recovery_time,
        jnp.zeros(args.duration + args.forecast),
    )
    for attempt in range(100):
        pyro.set_rng_seed(args.seed + attempt)
        sample = extended.generate(
            {"R0": args.basic_reproduction_number, "rho": args.response_rate}
        )
        obs = jnp.stack(
            [
                sample[f"obs_{t}"]
                for t in range(args.duration + args.forecast)
            ]
        )
        if float(obs[: args.duration].sum()) >= args.min_observations:
            truth = {
                k: v for k, v in sample.items() if not k.startswith("obs")
            }
            print(
                "generated data: %d observed infections during inference "
                "window, %d during forecast"
                % (
                    int(obs[: args.duration].sum()),
                    int(obs[args.duration :].sum()),
                )
            )
            return obs, truth
    raise RuntimeError("failed to generate a plausible epidemic")


def main(args):
    obs, truth = generate_data(args)
    model = SimpleSIRModel(
        args.population, args.recovery_time, obs[: args.duration]
    )

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
            f"svi loss: first={float(losses[0]):.1f} "
            f"last={float(losses[-1]):.1f}"
        )

    samples = model.predict(forecast=args.forecast)
    r0 = np.asarray(samples["R0"])
    print(
        "inferred R0: %.2f ± %.2f (true %.2f)"
        % (r0.mean(), r0.std(), args.basic_reproduction_number)
    )
    return float(r0.mean())


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="SIR epidemiology modeling")
    p.add_argument("--population", type=int, default=1000)
    p.add_argument("--recovery-time", type=float, default=7.0)
    p.add_argument("--basic-reproduction-number", type=float, default=1.5)
    p.add_argument("--response-rate", type=float, default=0.5)
    p.add_argument("--duration", type=int, default=20)
    p.add_argument("--forecast", type=int, default=10)
    p.add_argument("--min-observations", type=int, default=3)
    p.add_argument("--mcmc", action="store_true")
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--num-particles", type=int, default=8)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--num-samples", type=int, default=200)
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--num-chains", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
