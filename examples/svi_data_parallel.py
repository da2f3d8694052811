"""Data-parallel SVI over a device mesh.

Ref ``examples/svi_horovod.py``: the reference distributes SVI with
Horovod — a DistributedSampler shards the data per process and
``HorovodOptimizer`` ring-allreduces gradients (ref :23-89).  The
TPU-native equivalent needs no processes, samplers or allreduce code: the
minibatch is sharded over the ``data`` axis of a ``jax.sharding.Mesh``,
params are replicated, and XLA inserts the gradient ``psum`` over ICI
from the sharding constraints (``pyro_tpu.parallel.DataParallelSVI``).

On a single-chip (or CPU) host this runs on a virtual mesh — set
``XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu``
to exercise 8-way sharding without hardware.

Run:  python examples/svi_data_parallel.py --size 10000
"""

from __future__ import annotations

import argparse
import os

import jax

# the axon TPU plugin ignores the JAX_PLATFORMS env var; honor it through
# jax.config before the backend initializes (same recipe as tests/conftest)
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import AutoNormal
from pyro_tpu.optim import Adam
from pyro_tpu.parallel import DataParallelSVI


# A simple hierarchical regression model (ref svi_horovod.py:30-41).
def model(covariates, data=None):
    coeff = pyro.sample("coeff", dist.Normal(0.0, 1.0))
    bias = pyro.sample("bias", dist.Normal(0.0, 1.0))
    scale = pyro.sample("scale", dist.LogNormal(0.0, 1.0))
    with pyro.plate("data", covariates.shape[0]):
        loc = bias + coeff * covariates
        return pyro.sample("obs", dist.Normal(loc, scale), obs=data)


def generate_data(key, size):
    k1, k2 = jax.random.split(key)
    covariates = jax.random.normal(k1, (size,))
    data = 3.0 + 0.87 * covariates + 0.2 * jax.random.normal(k2, (size,))
    return covariates, data


def main(args):
    pyro.set_rng_seed(args.seed)
    covariates, data = generate_data(jax.random.key(args.seed), args.size)
    guide = AutoNormal(model)
    optim = Adam({"lr": args.learning_rate})

    if args.no_parallel or len(jax.devices()) == 1:
        svi = SVI(model, guide, optim, Trace_ELBO())
        mode = "single-device"
    else:
        svi = DataParallelSVI(model, guide, optim, Trace_ELBO())
        mode = f"{len(jax.devices())}-device data-parallel"
    print(f"running {mode} SVI on {args.size} points")

    losses = svi.run_steps(args.num_steps, covariates, data)
    print(f"loss: first={float(losses[0]):.1f} last={float(losses[-1]):.1f}")
    median = guide.median(covariates, data)
    print(
        "inferred: coeff=%.3f bias=%.3f scale=%.3f (true 0.87 / 3.0 / 0.2)"
        % (
            float(median["coeff"]),
            float(median["bias"]),
            float(median["scale"]),
        )
    )
    return median


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=10000)
    p.add_argument("--num-steps", type=int, default=1000)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--no-parallel", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
