"""Distribution sample/log_prob micro-benchmarks
(ref ``profiler/distributions.py``)."""

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist
from profiling_utils import benchmark, print_table

CASES = {
    "Normal": lambda: dist.Normal(jnp.zeros(1000), 1.0),
    "Gamma": lambda: dist.Gamma(jnp.full(1000, 2.0), 1.0),
    "Dirichlet": lambda: dist.Dirichlet(jnp.ones((100, 10))),
    "MVN": lambda: dist.MultivariateNormal(
        jnp.zeros((100, 16)), covariance_matrix=jnp.eye(16)
    ),
    "Categorical": lambda: dist.Categorical(logits=jnp.zeros((1000, 32))),
    "StudentT": lambda: dist.StudentT(3.0, jnp.zeros(1000), 1.0),
}


def main(args):
    key = jax.random.key(0)
    rows = []
    for name, mk in CASES.items():
        d = mk()
        sample = jax.jit(lambda k: d.sample(k, (args.num_samples,)))
        s_best, _ = benchmark(sample, key)
        x = sample(key)
        lp = jax.jit(d.log_prob)
        l_best, _ = benchmark(lp, x)
        rows.append((name, f"{s_best*1e3:.2f}", f"{l_best*1e3:.2f}"))
    print_table(rows, ("dist", "sample_ms", "log_prob_ms"))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-samples", type=int, default=100)
    main(p.parse_args())
