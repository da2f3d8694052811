"""Variational autoencoder (ref ``examples/vae/vae.py``).

Amortized SVI: a flax decoder defines p(x|z), a flax encoder defines
q(z|x); one jitted SVI step trains both.  Uses synthetic binarized data by
default (the environment has no dataset egress); pass your own batches for
real data.

Run:  python examples/vae.py --num-epochs 3
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.nn import flax_module
from pyro_tpu.optim import Adam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None


X_DIM = 784
HIDDEN = 400
Z_DIM = 50


class Decoder(nn.Module):
    @nn.compact
    def __call__(self, z):
        h = nn.softplus(nn.Dense(HIDDEN)(z))
        return nn.Dense(X_DIM)(h)  # bernoulli logits


class Encoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.softplus(nn.Dense(HIDDEN)(x))
        loc = nn.Dense(Z_DIM)(h)
        log_scale = nn.Dense(Z_DIM)(h)
        return loc, jnp.exp(jnp.clip(log_scale, -5.0, 5.0))


def model(x):
    decoder = flax_module("decoder", Decoder(), jnp.zeros((1, Z_DIM)))
    with pyro.plate("data", x.shape[0]):
        z = pyro.sample(
            "z", dist.Normal(jnp.zeros(Z_DIM), 1.0).to_event(1)
        )
        logits = decoder(z)
        pyro.sample(
            "obs", dist.Bernoulli(logits=logits).to_event(1), obs=x
        )


def guide(x):
    encoder = flax_module("encoder", Encoder(), jnp.zeros((1, X_DIM)))
    with pyro.plate("data", x.shape[0]):
        loc, scale = encoder(x)
        pyro.sample("z", dist.Normal(loc, scale).to_event(1))


def synthetic_batches(key, num_batches: int, batch_size: int):
    """Binarized pseudo-digits: random low-rank logits."""
    k1, k2 = jax.random.split(key)
    basis = jax.random.normal(k1, (16, X_DIM))
    codes = jax.random.normal(
        k2, (num_batches, batch_size, 16)
    )
    probs = jax.nn.sigmoid(codes @ basis * 2.0)
    return (jax.random.uniform(k2, probs.shape) < probs).astype(
        jnp.float32
    )


def main(args):
    pyro.set_rng_seed(args.seed)
    data = synthetic_batches(
        jax.random.key(args.seed), args.num_batches, args.batch_size
    )
    svi = SVI(
        model, guide, Adam({"lr": args.learning_rate}), Trace_ELBO()
    )
    for epoch in range(args.num_epochs):
        t0 = time.time()
        total = 0.0
        for i in range(args.num_batches):
            total += svi.step(data[i])
        dt = time.time() - t0
        steps_per_sec = args.num_batches / dt
        print(
            f"epoch {epoch}: elbo = {-total / args.num_batches:.1f} "
            f"({steps_per_sec:.1f} steps/s)"
        )
    return svi


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-epochs", type=int, default=3)
    p.add_argument("--num-batches", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
