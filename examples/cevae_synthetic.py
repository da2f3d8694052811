"""Causal effect VAE on synthetic confounded data.

Ref ``examples/contrib/cevae/synthetic.py`` (Louizos et al. 2017): a
latent confounder z drives features x, treatment t and outcome y; CEVAE
recovers the individual treatment effect from observational data.

Run:  python examples/cevae_synthetic.py --num-data 500
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
from pyro_tpu.contrib.cevae import CEVAE


def generate_data(args):
    """z ~ Bern(0.5); x ~ Normal(z, 5z+3(1-z)); t ~ Bern(.75z+.25(1-z));
    y ~ Bern(sigmoid(3(z+2(2t-1)))) (ref synthetic.py:23-36)."""
    key = jax.random.key(args.seed)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    n = args.num_data
    z = jax.random.bernoulli(k1, 0.5, (n,)).astype(jnp.float32)
    x = jax.random.normal(k2, (n, args.feature_dim)) * (
        5.0 * z + 3.0 * (1.0 - z)
    )[:, None] + z[:, None]
    t = jax.random.bernoulli(
        k3, 0.75 * z + 0.25 * (1.0 - z)
    ).astype(jnp.float32)
    y = jax.nn.sigmoid(3.0 * (z + 2.0 * (2.0 * t - 1.0)))
    y = y + 0.1 * jax.random.normal(k4, (n,))
    # true ITE per unit (difference of the two potential outcomes)
    y1 = jax.nn.sigmoid(3.0 * (z + 2.0))
    y0 = jax.nn.sigmoid(3.0 * (z - 2.0))
    return x, t, y, y1 - y0


def main(args):
    pyro.set_rng_seed(args.seed)
    x, t, y, true_ite = generate_data(args)
    cevae = CEVAE(
        feature_dim=args.feature_dim,
        latent_dim=args.latent_dim,
        hidden_dim=args.hidden_dim,
    )
    losses = cevae.fit(
        x,
        t,
        y,
        num_epochs=args.num_epochs,
        learning_rate=args.learning_rate,
    )
    print(
        f"loss: first={float(losses[0]):.3f} last={float(losses[-1]):.3f}"
    )
    est_ite = cevae.ite(x, num_samples=args.num_samples)
    est_ate, true_ate = float(jnp.mean(est_ite)), float(
        jnp.mean(true_ite)
    )
    print(f"ATE: estimated {est_ate:.3f}, true {true_ate:.3f}")
    return est_ate


if __name__ == "__main__":
    p = argparse.ArgumentParser(
        description="CEVAE on synthetic confounded data"
    )
    p.add_argument("--num-data", type=int, default=500)
    p.add_argument("--feature-dim", type=int, default=5)
    p.add_argument("--latent-dim", type=int, default=8)
    p.add_argument("--hidden-dim", type=int, default=64)
    p.add_argument("--num-epochs", type=int, default=300)
    p.add_argument("--num-samples", type=int, default=50)
    p.add_argument("--learning-rate", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
