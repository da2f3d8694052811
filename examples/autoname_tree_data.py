"""Hierarchical model over arbitrary json-like tree data via ``named``.

Ref ``examples/contrib/autoname/tree_data.py``: a linear mixed-effects
model recursing over nested lists/dicts of observations; ``named``
containers generate unique site names matching the data's shape, and a
mean-field guide mirrors the recursion.

Run:  python examples/autoname_tree_data.py --num-epochs 100
"""

from __future__ import annotations

import argparse

import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.autoname import named
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.optim import Adam


def _is_value(data):
    return isinstance(data, (float, int)) or hasattr(data, "shape")


def model(data):
    latent = named.Object("latent")
    latent.z.sample_(dist.Normal(0.0, 1.0))
    model_recurse(data, latent)


def model_recurse(data, latent):
    if _is_value(data):
        latent.x.sample_(
            dist.Normal(latent.z, 1.0), obs=jnp.asarray(data)
        )
    elif isinstance(data, list):
        latent.prior_scale.param_(
            jnp.asarray(1.0), constraint=constraints.positive
        )
        latent.list = named.List()
        for data_i in data:
            latent_i = latent.list.add()
            latent_i.z.sample_(
                dist.Normal(latent.z, latent.prior_scale)
            )
            model_recurse(data_i, latent_i)
    elif isinstance(data, dict):
        latent.prior_scale.param_(
            jnp.asarray(1.0), constraint=constraints.positive
        )
        latent.dict = named.Dict()
        for key, value in data.items():
            latent.dict[key].z.sample_(
                dist.Normal(latent.z, latent.prior_scale)
            )
            model_recurse(value, latent.dict[key])
    else:
        raise TypeError(f"Unsupported type {type(data)}")


def guide(data):
    guide_recurse(data, named.Object("latent"))


def guide_recurse(data, latent):
    latent.post_loc.param_(jnp.asarray(0.0))
    latent.post_scale.param_(
        jnp.asarray(1.0), constraint=constraints.positive
    )
    latent.z.sample_(
        dist.Normal(latent.post_loc, latent.post_scale)
    )
    if _is_value(data):
        pass
    elif isinstance(data, list):
        latent.list = named.List()
        for datum in data:
            guide_recurse(datum, latent.list.add())
    elif isinstance(data, dict):
        latent.dict = named.Dict()
        for key, value in data.items():
            guide_recurse(value, latent.dict[key])
    else:
        raise TypeError(f"Unsupported type {type(data)}")


def main(args):
    pyro.set_rng_seed(0)
    pyro.clear_param_store()
    data = {
        "a": 1.0,
        "b": [2.0, 3.0],
        "c": {"d": 4.0, "e": [5.0, 6.0]},
    }
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO())
    for step in range(args.num_epochs):
        loss = svi.step(data)
        if step % 20 == 0:
            print(f"step {step} loss = {float(loss):0.5g}")
    top_loc = float(pyro.param("latent.post_loc"))
    print("posterior z loc at root =", top_loc)
    return top_loc


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="mixed-effects model over tree-shaped data"
    )
    p.add_argument("-n", "--num-epochs", type=int, default=100)
    main(p.parse_args())
