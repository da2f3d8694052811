"""Eight schools via SVI (ref ``examples/eight_schools/svi.py``).

Hand-written mean-field guide with an ExpTransform for tau; the whole
training loop runs as one compiled scan (``SVI.run_steps``).

Run:  python examples/eight_schools_svi.py --num-epochs 1000
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions import constraints, transforms
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.optim import Adam

J = 8
y = jnp.array([28.0, 8.0, -3.0, 7.0, -1.0, 1.0, 18.0, 12.0])
sigma = jnp.array([15.0, 10.0, 16.0, 11.0, 9.0, 11.0, 10.0, 18.0])
data = jnp.stack([y, sigma], -1)


def model(data):
    y = data[:, 0]
    sigma = data[:, 1]
    with pyro.plate("data", J):
        eta = pyro.sample("eta", dist.Normal(jnp.zeros(J), 1.0))
        mu = pyro.sample("mu", dist.Normal(jnp.zeros(1), 10.0))
        tau = pyro.sample("tau", dist.HalfCauchy(25.0 * jnp.ones(1)))
        theta = mu + tau * eta
        pyro.sample("obs", dist.Normal(theta, sigma), obs=y)


def guide(data):
    loc_eta = pyro.param("loc_eta", jnp.zeros(J))
    scale_eta = pyro.param(
        "scale_eta", 0.1 * jnp.ones(J), constraint=constraints.positive
    )
    loc_mu = pyro.param("loc_mu", jnp.zeros(1))
    scale_mu = pyro.param(
        "scale_mu", 0.1 * jnp.ones(1), constraint=constraints.positive
    )
    loc_logtau = pyro.param("loc_logtau", jnp.zeros(1))
    scale_logtau = pyro.param(
        "scale_logtau",
        0.1 * jnp.ones(1),
        constraint=constraints.positive,
    )
    with pyro.plate("data", J):
        pyro.sample("eta", dist.Normal(loc_eta, scale_eta))
        pyro.sample("mu", dist.Normal(loc_mu, scale_mu))
        pyro.sample(
            "tau",
            dist.TransformedDistribution(
                dist.Normal(loc_logtau, scale_logtau),
                [transforms.ExpTransform()],
            ),
        )


def main(args):
    pyro.clear_param_store()
    pyro.set_rng_seed(args.seed)
    svi = SVI(model, guide, Adam({"lr": args.lr}), Trace_ELBO())
    losses = svi.run_steps(args.num_epochs, data)
    print(
        f"loss: first={float(losses[0]):.2f} last={float(losses[-1]):.2f}"
    )
    print("posterior mean of mu:", float(pyro.param("loc_mu")[0]))
    print(
        "posterior mean of log tau:", float(pyro.param("loc_logtau")[0])
    )
    return float(pyro.param("loc_mu")[0])


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Eight Schools SVI")
    parser.add_argument("--lr", type=float, default=0.01)
    parser.add_argument("--num-epochs", type=int, default=1000)
    parser.add_argument("--seed", type=int, default=0)
    main(parser.parse_args())
