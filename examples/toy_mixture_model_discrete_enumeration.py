"""Toy mixture model with discrete enumeration
(ref ``examples/toy_mixture_model_discrete_enumeration.py``).

    (A) -> [B] -> (C)

A and C are observed Bernoullis; the hidden mixture indicator B is
marginalized out exactly by ``TraceEnum_ELBO``.  Beta posteriors over the
CPD entries are learned with a conjugate-family guide.

Run: ``python examples/toy_mixture_model_discrete_enumeration.py -n 500``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, TraceEnum_ELBO, config_enumerate
from pyro_tpu.ops.indexing import Vindex
from pyro_tpu.optim import Adam

PRIOR = {
    "A": jnp.asarray([1.0, 10.0]),
    "B": jnp.asarray([[10.0, 1.0], [1.0, 10.0]]),
    "C": jnp.asarray([[10.0, 1.0], [1.0, 10.0]]),
}


def generate_data(num_obs, key):
    k = jax.random.split(key, 6)
    CPDs = {
        "p_A": dist.Beta(PRIOR["A"][0], PRIOR["A"][1]).sample(k[0]),
        "p_B": dist.Beta(PRIOR["B"][:, 0], PRIOR["B"][:, 1]).sample(k[1]),
        "p_C": dist.Beta(PRIOR["C"][:, 0], PRIOR["C"][:, 1]).sample(k[2]),
    }
    A = dist.Bernoulli(jnp.ones(num_obs) * CPDs["p_A"]).sample(k[3])
    B = dist.Bernoulli(CPDs["p_B"][A.astype(int)]).sample(k[4])
    C = dist.Bernoulli(CPDs["p_C"][B.astype(int)]).sample(k[5])
    return CPDs, {"A": A, "C": C}


@config_enumerate
def model(data, num_obs):
    p_A = pyro.sample("p_A", dist.Beta(1.0, 1.0))
    with pyro.plate("p_B_plate", 2):
        p_B = pyro.sample("p_B", dist.Beta(1.0, 1.0))
    with pyro.plate("p_C_plate", 2):
        p_C = pyro.sample("p_C", dist.Beta(1.0, 1.0))
    with pyro.plate("data_plate", num_obs):
        A = pyro.sample(
            "A", dist.Bernoulli(p_A), obs=data["A"]
        )
        B = pyro.sample(
            "B", dist.Bernoulli(Vindex(p_B)[A.astype(int)])
        )  # enumerated out
        pyro.sample(
            "C",
            dist.Bernoulli(Vindex(p_C)[B.astype(int)]),
            obs=data["C"],
        )


def guide(data, num_obs):
    a = pyro.param(
        "a", PRIOR["A"][0] * jnp.ones(()), constraint=constraints.positive
    )
    b = pyro.param(
        "b", PRIOR["A"][1] * jnp.ones(()), constraint=constraints.positive
    )
    pyro.sample("p_A", dist.Beta(a, b))
    aB = pyro.param("aB", PRIOR["B"][:, 0], constraint=constraints.positive)
    bB = pyro.param("bB", PRIOR["B"][:, 1], constraint=constraints.positive)
    with pyro.plate("p_B_plate", 2):
        pyro.sample("p_B", dist.Beta(aB, bB))
    aC = pyro.param("aC", PRIOR["C"][:, 0], constraint=constraints.positive)
    bC = pyro.param("bC", PRIOR["C"][:, 1], constraint=constraints.positive)
    with pyro.plate("p_C_plate", 2):
        pyro.sample("p_C", dist.Beta(aC, bC))


def main(args):
    pyro.set_rng_seed(0)
    pyro.clear_param_store()
    CPDs, data = generate_data(args.num_obs, jax.random.key(0))
    # close over num_obs: a python int argument would become a traced
    # array under jit (plate sizes must be static)
    n = args.num_obs
    svi = SVI(
        lambda data: model(data, n),
        lambda data: guide(data, n),
        Adam({"lr": args.learning_rate}),
        TraceEnum_ELBO(max_plate_nesting=1),
    )
    losses = []
    for step in range(args.num_steps):
        losses.append(svi.step(data))
        if step % 100 == 0:
            print(f"{step: >5d}\t{losses[-1]:.1f}")
    store = pyro.get_param_store()
    post_A = float(store["a"] / (store["a"] + store["b"]))
    print(f"true p_A = {float(CPDs['p_A']):.3f}, posterior mean = {post_A:.3f}")
    return losses


if __name__ == "__main__":
    p = argparse.ArgumentParser(description="Toy mixture with enumeration")
    p.add_argument("-n", "--num-steps", default=1000, type=int)
    p.add_argument("-o", "--num-obs", default=1000, type=int)
    p.add_argument("-lr", "--learning-rate", default=0.05, type=float)
    main(p.parse_args())
