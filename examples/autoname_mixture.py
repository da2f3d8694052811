"""Gaussian mixture with ``named`` data structures.

Ref ``examples/contrib/autoname/mixture.py``: a simple GMM written with
``pyro_tpu.contrib.autoname.named`` — site names are derived from the
address of each value in nested Object/List containers, so local models
implemented as helper functions need no manual name plumbing.

Run:  python examples/autoname_mixture.py -n 200
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.autoname import named
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.optim import Adam


def model(data, k):
    latent = named.Object("latent")
    latent.probs.param_(jnp.ones(k) / k, constraint=constraints.simplex)
    latent.locs.param_(jnp.zeros(k))
    latent.scales.param_(jnp.ones(k), constraint=constraints.positive)

    latent.local = named.List()
    for x in data:
        local_model(
            latent.local.add(),
            latent.probs,
            latent.locs,
            latent.scales,
            obs=x,
        )


def local_model(latent, ps, locs, scales, obs=None):
    i = latent.id.sample_(dist.Categorical(ps))
    return latent.x.sample_(dist.Normal(locs[i], scales[i]), obs=obs)


def guide(data, k):
    latent = named.Object("latent")
    latent.local = named.List()
    for x in data:
        local_guide(latent.local.add(), k)


def local_guide(latent, k):
    probs = latent.probs.param_(
        jnp.ones(k) / k, constraint=constraints.positive
    )
    latent.id.sample_(dist.Categorical(probs))


def main(args):
    pyro.set_rng_seed(0)
    optim = Adam({"lr": 0.1})
    inference = SVI(model, guide, optim, loss=Trace_ELBO())
    data = jnp.array([0.0, 1.0, 2.0, 20.0, 30.0, 40.0])
    k = 2

    print("Step\tLoss")
    loss = 0.0
    for step in range(args.num_epochs):
        if step and step % 10 == 0:
            print(f"{step}\t{loss:0.5g}")
            loss = 0.0
        loss += float(inference.step(data, k=k))

    print("Parameters:")
    for name in sorted(pyro.get_param_store().keys()):
        print(f"{name} = {jax.device_get(pyro.param(name))}")
    return float(pyro.param("latent.locs")[0])


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="parse args")
    parser.add_argument("-n", "--num-epochs", default=200, type=int)
    main(parser.parse_args())
