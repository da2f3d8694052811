"""GaussianHMM.log_prob benchmark (ref ``profiler/gaussianhmm.py``)."""

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist
from profiling_utils import benchmark, print_table


def make_hmm(T, hidden_dim, obs_dim, batch):
    k = jax.random.split(jax.random.key(0), 5)
    init = dist.MultivariateNormal(
        jnp.zeros(hidden_dim), covariance_matrix=jnp.eye(hidden_dim)
    )
    A = 0.9 * jnp.eye(hidden_dim)
    trans = dist.MultivariateNormal(
        jnp.zeros(hidden_dim), covariance_matrix=0.1 * jnp.eye(hidden_dim)
    )
    C = jax.random.normal(k[3], (hidden_dim, obs_dim))
    obs = dist.MultivariateNormal(
        jnp.zeros(obs_dim), covariance_matrix=0.1 * jnp.eye(obs_dim)
    )
    hmm = dist.GaussianHMM(init, A, trans, C, obs, duration=T)
    value = jax.random.normal(k[4], (batch, T, obs_dim))
    return hmm, value


def main(args):
    rows = []
    for T in [16, 64, 256, 1024, 4096]:
        hmm, value = make_hmm(T, args.hidden_dim, args.obs_dim, args.batch)
        lp = jax.jit(hmm.log_prob)
        best, mean = benchmark(lp, value)
        rows.append((T, f"{best*1e3:.2f}", f"{mean*1e3:.2f}"))
    print_table(rows, ("T", "best_ms", "mean_ms"))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--hidden-dim", type=int, default=4)
    p.add_argument("--obs-dim", type=int, default=4)
    p.add_argument("--batch", type=int, default=8)
    main(p.parse_args())
