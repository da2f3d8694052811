"""Baseball batting averages — partial pooling with NUTS
(ref ``examples/baseball.py``; Efron & Morris 1975 data)."""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import MCMC, NUTS

# first-45 at-bats data (Efron & Morris 1975, public)
AT_BATS = jnp.full((18,), 45.0)
HITS = jnp.array(
    [18.0, 17, 16, 15, 14, 14, 13, 12, 11, 11, 10, 10, 10, 10, 10, 9, 8, 7]
)


def fully_pooled(at_bats, hits):
    phi = pyro.sample("phi", dist.Uniform(0.0, 1.0))
    with pyro.plate("players", at_bats.shape[0]):
        pyro.sample(
            "obs", dist.Binomial(at_bats, probs=phi), obs=hits
        )


def not_pooled(at_bats, hits):
    with pyro.plate("players", at_bats.shape[0]):
        phi = pyro.sample("phi", dist.Uniform(0.0, 1.0))
        pyro.sample(
            "obs", dist.Binomial(at_bats, probs=phi), obs=hits
        )


def partially_pooled(at_bats, hits):
    m = pyro.sample("m", dist.Uniform(0.0, 1.0))
    kappa = pyro.sample("kappa", dist.Pareto(1.0, 1.5))
    with pyro.plate("players", at_bats.shape[0]):
        phi = pyro.sample(
            "phi", dist.Beta(m * kappa, (1 - m) * kappa)
        )
        pyro.sample(
            "obs", dist.Binomial(at_bats, probs=phi), obs=hits
        )


MODELS = {
    "fully_pooled": fully_pooled,
    "not_pooled": not_pooled,
    "partially_pooled": partially_pooled,
}


def main(args):
    model = MODELS[args.model]
    mcmc = MCMC(
        NUTS(model),
        num_samples=args.num_samples,
        warmup_steps=args.warmup_steps,
        num_chains=args.num_chains,
    )
    mcmc.run(AT_BATS, HITS, rng_key=jax.random.key(args.seed))
    mcmc.summary()
    return mcmc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="partially_pooled", choices=MODELS)
    p.add_argument("--num-samples", type=int, default=800)
    p.add_argument("--warmup-steps", type=int, default=800)
    p.add_argument("--num-chains", type=int, default=2)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
