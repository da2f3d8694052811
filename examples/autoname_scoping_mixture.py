"""Mixture model with automatically scoped site names.

Ref ``examples/contrib/autoname/scoping_mixture.py``: the mixture's local
model/guide pair lives in helper functions whose sites are auto-prefixed
by ``@scope``, demonstrating modular naming; assignments are enumerated
out by TraceEnum_ELBO.

Run:  python examples/autoname_scoping_mixture.py --num-epochs 100
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.autoname import scope
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, TraceEnum_ELBO, config_enumerate
from pyro_tpu.optim import Adam

K = 2


@scope(prefix="local")
def local_model(weights, locs, scale, data):
    assignment = pyro.sample(
        "assignment",
        dist.Categorical(weights).expand_by([len(data)]),
    )
    return pyro.sample(
        "obs", dist.Normal(locs[assignment], scale), obs=data
    )


def model(data):
    weights = pyro.param(
        "weights", jnp.ones(K) / K, constraint=constraints.simplex
    )
    # data-driven init (k-means style spread) avoids the one-wide-component
    # local optimum
    locs = pyro.param("locs", jnp.asarray([data.min(), data.max()]))
    scale = pyro.param(
        "scale", jnp.asarray(0.5), constraint=constraints.positive
    )
    with pyro.plate("data", len(data)):
        return local_model(weights, locs, scale, data)


@scope(prefix="local")
def local_guide(probs):
    return pyro.sample("assignment", dist.Categorical(probs))


def guide(data):
    assignment_probs = pyro.param(
        "assignment_probs",
        jnp.ones((len(data), K)) / K,
        constraint=constraints.simplex,
    )
    with pyro.plate("data", len(data)):
        return local_guide(assignment_probs)


def main(args):
    pyro.set_rng_seed(0)
    pyro.clear_param_store()

    data = jnp.asarray([0.0, 1.0, 2.0, 20.0, 30.0, 40.0])
    svi = SVI(
        model,
        config_enumerate(guide),
        Adam({"lr": 0.1}),
        TraceEnum_ELBO(max_plate_nesting=1),
    )

    print("Step\tLoss")
    for step in range(args.num_epochs):
        loss = svi.step(data)
        if step % 10 == 0:
            print(f"{step}\t{float(loss):0.5g}")

    locs = np.sort(np.asarray(pyro.param("locs")))
    print("locs =", locs)
    if args.num_epochs >= 200:
        # the two components must separate onto the two clusters
        assert locs[0] < 10.0 < locs[1], locs
    return locs


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="scoped mixture model")
    p.add_argument("-n", "--num-epochs", type=int, default=200)
    main(p.parse_args())
