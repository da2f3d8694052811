"""The minipyro demo (ref ``examples/minipyro.py``).

Runs the same conjugate-Normal model through two backends:
``minipyro`` (``pyro_tpu.contrib.minipyro`` — the didactic ~200-line
implementation of the effect-handler core) and ``pyro`` (the full
framework), asserting both recover the posterior mean.

Run:  python examples/minipyro.py --backend minipyro
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp


def main(args):
    if args.backend == "minipyro":
        from pyro_tpu.contrib import minipyro as pyro
        from pyro_tpu.contrib.minipyro import (
            SVI,
            Adam,
            Trace_ELBO,
            get_param_store,
        )
        import pyro_tpu.distributions as dist
    else:
        import pyro_tpu as pyro
        import pyro_tpu.distributions as dist
        from pyro_tpu.infer import SVI, Trace_ELBO
        from pyro_tpu.optim import Adam

        get_param_store = pyro.get_param_store

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        with pyro.plate("data", len(data), dim=-1):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        guide_loc = pyro.param("guide_loc", jnp.zeros(()))
        guide_scale = jnp.exp(
            pyro.param("guide_scale_log", jnp.zeros(()))
        )
        pyro.sample("loc", dist.Normal(guide_loc, guide_scale))

    data = jax.random.normal(jax.random.key(0), (100,)) + 3.0

    elbo = Trace_ELBO()
    adam = Adam({"lr": args.learning_rate})
    svi = SVI(model, guide, adam, elbo)

    get_param_store().clear()
    for step in range(args.num_steps):
        loss = svi.step(data)
        if step % 100 == 0:
            print(f"step {step} loss = {float(loss)}")

    for name in get_param_store():
        print(f"{name} = {jax.device_get(pyro.param(name))}")

    # conjugate posterior: loc | data ~ N(sum(data)/(n+1), 1/(n+1));
    # only check convergence when given enough steps to converge
    if args.num_steps >= 1000:
        assert abs(float(pyro.param("guide_loc")) - 3.0) < 0.1
    return float(pyro.param("guide_loc"))


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Mini Pyro demo")
    parser.add_argument("-b", "--backend", default="minipyro",
                        choices=["minipyro", "pyro"])
    parser.add_argument("-n", "--num-steps", default=1001, type=int)
    parser.add_argument("-lr", "--learning-rate", default=0.02, type=float)
    args = parser.parse_args()
    main(args)
