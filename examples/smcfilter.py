"""SMC filtering of a noisy harmonic oscillator
(ref ``examples/smcfilter.py``):

    z[t] ~ N(A z[t-1], B sigma_z)
    y[t] ~ N(z[t][0], sigma_y)

All particles live on one leading axis, so each SMC step (propose,
weight, resample) is a single batched device computation.

Run: ``python examples/smcfilter.py -n 50 -p 100``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import SMCFilter


class SimpleHarmonicModel:
    def __init__(self, process_noise, measurement_noise):
        self.A = jnp.asarray([[0.0, 1.0], [-1.0, 0.0]])
        self.B = jnp.asarray([3.0, 3.0])
        self.sigma_z = process_noise
        self.sigma_y = measurement_noise

    def init(self, state, initial):
        self.t = 0
        state["z"] = pyro.sample(
            "z_init", dist.Delta(initial, event_dim=1)
        )

    def step(self, state, y=None):
        self.t += 1
        state["z"] = pyro.sample(
            f"z_{self.t}",
            dist.Normal(
                state["z"] @ self.A, self.B * self.sigma_z
            ).to_event(1),
        )
        y = pyro.sample(
            f"y_{self.t}",
            dist.Normal(state["z"][..., 0], self.sigma_y),
            obs=y,
        )
        return state["z"], y


class SimpleHarmonicModel_Guide:
    def __init__(self, model):
        self.model = model

    def init(self, state, initial):
        self.t = 0
        pyro.sample("z_init", dist.Delta(initial, event_dim=1))

    def step(self, state, y=None):
        self.t += 1
        # proposal distribution
        pyro.sample(
            f"z_{self.t}",
            dist.Normal(
                state["z"] @ self.model.A, jnp.asarray([1.0, 1.0])
            ).to_event(1),
        )


def generate_data(args):
    model = SimpleHarmonicModel(args.process_noise, args.measurement_noise)
    state = {}
    initial = jnp.asarray([1.0, 0.0])
    with poutine.seed(rng_key=jax.random.key(args.seed)):
        model.init(state, initial=initial)
        zs, ys = [initial], [None]
        for t in range(args.num_timesteps):
            z, y = model.step(state)
            zs.append(z)
            ys.append(y)
    return zs, ys


def main(args):
    pyro.set_rng_seed(args.seed)
    model = SimpleHarmonicModel(args.process_noise, args.measurement_noise)
    guide = SimpleHarmonicModel_Guide(model)
    smc = SMCFilter(
        model, guide, num_particles=args.num_particles, max_plate_nesting=0
    )

    print("Generating data")
    zs, ys = generate_data(args)

    print("Filtering")
    smc.init(initial=jnp.asarray([1.0, 0.0]))
    for y in ys[1:]:
        smc.step(y)

    z = smc.get_empirical()["z"]
    print(f"truth: {np.asarray(zs[-1])}")
    print(f"mean:  {np.asarray(z['mean'])}")
    print(f"std:   {np.asarray(z['variance']) ** 0.5}")
    return np.asarray(z["mean"]), np.asarray(zs[-1])


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Simple Harmonic Oscillator w/ SMC Filtering Inference"
    )
    parser.add_argument("-n", "--num-timesteps", default=50, type=int)
    parser.add_argument("-p", "--num-particles", default=100, type=int)
    parser.add_argument("--process-noise", default=1.0, type=float)
    parser.add_argument("--measurement-noise", default=1.0, type=float)
    parser.add_argument("--seed", default=0, type=int)
    main(parser.parse_args())
