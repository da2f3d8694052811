"""LKJ prior over a covariance's correlation structure with NUTS
(ref ``examples/lkj.py``): HalfCauchy scales x LKJCholesky correlation,
MVN likelihood.  Chains are vmapped on one chip instead of the
reference's process pool.

Run: ``python examples/lkj.py --n 200 --num-variables 3``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import MCMC, NUTS


def model(y):
    d = y.shape[1]
    N = y.shape[0]
    # per-variable scales
    theta = pyro.sample("theta", dist.HalfCauchy(jnp.ones(d)).to_event(1))
    # uniform prior over correlation matrices
    L_omega = pyro.sample("L_omega", dist.LKJCholesky(d, 1.0))
    L_Omega = jnp.diag(jnp.sqrt(theta)) @ L_omega
    mu = jnp.zeros(d)
    with pyro.plate("observations", N):
        pyro.sample(
            "obs", dist.MultivariateNormal(mu, scale_tril=L_Omega), obs=y
        )


def main(args):
    pyro.set_rng_seed(args.rng_seed)
    rng = np.random.RandomState(args.rng_seed)
    # correlated synthetic data so the posterior has something to find
    true_corr = 0.6
    d = args.num_variables
    C = np.full((d, d), true_corr) + (1 - true_corr) * np.eye(d)
    y = jnp.asarray(
        rng.multivariate_normal(np.zeros(d), C, size=args.n), jnp.float32
    )
    mcmc = MCMC(
        NUTS(model),
        num_samples=args.num_samples,
        warmup_steps=args.warmup_steps,
        num_chains=args.num_chains,
    )
    mcmc.run(y, rng_key=jax.random.key(args.rng_seed))
    L = np.asarray(mcmc.get_samples()["L_omega"])
    corr = np.einsum("sij,skj->sik", L, L)  # L L^T per sample
    print(
        f"posterior mean correlation[0,1] = {corr[:, 0, 1].mean():.3f} "
        f"(true {true_corr})"
    )
    return corr


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="LKJ prior demo")
    parser.add_argument("--num-samples", default=200, type=int)
    parser.add_argument("--n", default=500, type=int)
    parser.add_argument("--num-chains", default=1, type=int)
    parser.add_argument("--num-variables", default=5, type=int)
    parser.add_argument("--warmup-steps", default=100, type=int)
    parser.add_argument("--rng_seed", default=0, type=int)
    main(parser.parse_args())
