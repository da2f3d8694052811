"""Deep Markov Model (ref ``examples/dmm.py``; Krishnan et al. 2017).

Gated transitions + RNN-free amortized guide (a simple bidirectional MLP
over windows stands in for the reference's RNN; the inference structure —
one latent per time step, combiner network — matches).  Synthetic
polyphonic-music-like data by default.
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
from pyro_tpu.optim import ClippedAdam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

# the reference example's JSB-chorales regime (ref examples/dmm.py:40-120:
# 88 tones, z=100, transition MLP width 200; the guide's future summary is
# an MLP encoder standing in for the reference's 600-wide RNN)
Z_DIM = 100
X_DIM = 88
HIDDEN = 200


class GatedTransition(nn.Module):
    @nn.compact
    def __call__(self, z):
        gate = nn.sigmoid(
            nn.Dense(Z_DIM)(nn.relu(nn.Dense(HIDDEN)(z)))
        )
        prop_mean = nn.Dense(Z_DIM)(nn.relu(nn.Dense(HIDDEN)(z)))
        loc = (1 - gate) * nn.Dense(Z_DIM)(z) + gate * prop_mean
        scale = nn.softplus(nn.Dense(Z_DIM)(nn.relu(prop_mean))) + 1e-3
        return loc, scale


class Emitter(nn.Module):
    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(HIDDEN)(z))
        return nn.Dense(X_DIM)(h)  # bernoulli logits


class Combiner(nn.Module):
    @nn.compact
    def __call__(self, z_prev, x_future_summary):
        h = 0.5 * (
            nn.tanh(nn.Dense(HIDDEN)(z_prev)) + x_future_summary
        )
        loc = nn.Dense(Z_DIM)(h)
        scale = nn.softplus(nn.Dense(Z_DIM)(h)) + 1e-3
        return loc, scale


class Encoder(nn.Module):
    """Summarizes x_{t:T} for the guide (stand-in for the reference RNN)."""

    @nn.compact
    def __call__(self, x):
        return nn.tanh(nn.Dense(HIDDEN)(x))


def model(sequences):
    B, T, _ = sequences.shape
    trans = flax_module(
        "transition", GatedTransition(), jnp.zeros((1, Z_DIM))
    )
    emitter = flax_module("emitter", Emitter(), jnp.zeros((1, Z_DIM)))
    z_prev = jnp.zeros((B, Z_DIM))
    # hoist the plate out of the time loop: one plate object per trace
    # (a fresh plate per step would collide, as in the reference)
    tones_plate = pyro.plate("tones", X_DIM, dim=-1)
    with pyro.plate("sequences", B, dim=-2):
        for t in pyro.markov(range(T)):
            loc, scale = trans(z_prev)
            z = pyro.sample(
                f"z_{t}",
                dist.Normal(loc, scale).to_event(1),
            )
            logits = emitter(z)
            with tones_plate:
                pyro.sample(
                    f"x_{t}",
                    dist.Bernoulli(logits=logits),
                    obs=sequences[:, t],
                )
            z_prev = z


def guide(sequences):
    B, T, _ = sequences.shape
    combiner = flax_module(
        "combiner",
        Combiner(),
        jnp.zeros((1, Z_DIM)),
        jnp.zeros((1, HIDDEN)),
    )
    encoder = flax_module("encoder", Encoder(), jnp.zeros((1, X_DIM)))
    # reversed cumulative summary of the future
    h = encoder(sequences)  # (B, T, H)
    future = jnp.flip(jnp.cumsum(jnp.flip(h, 1), axis=1), 1) / jnp.arange(
        T, 0, -1
    ).reshape(1, T, 1)
    z_prev = jnp.zeros((B, Z_DIM))
    with pyro.plate("sequences", B, dim=-2):
        for t in pyro.markov(range(T)):
            loc, scale = combiner(z_prev, future[:, t])
            z = pyro.sample(
                f"z_{t}", dist.Normal(loc, scale).to_event(1)
            )
            z_prev = z


def synthetic_data(key, batch, T):
    k1, k2 = jax.random.split(key)
    basis = jax.random.normal(k1, (Z_DIM, X_DIM))
    z = jnp.cumsum(
        0.3 * jax.random.normal(k2, (batch, T, Z_DIM)), axis=1
    )
    probs = jax.nn.sigmoid(z @ basis)
    return (
        jax.random.uniform(k2, probs.shape) < probs
    ).astype(jnp.float32)


def main(args):
    pyro.set_rng_seed(args.seed)
    data = synthetic_data(
        jax.random.key(args.seed), args.batch_size, args.length
    )
    svi = SVI(
        model,
        guide,
        ClippedAdam({"lr": args.learning_rate, "clip_norm": 10.0}),
        Trace_ELBO(),
    )
    t0 = time.time()
    for step in range(args.num_steps):
        loss = svi.step(data)
        if step % 5 == 0:
            print(f"step {step: 4d} loss = {loss / data.size:.4f}")
    dt = time.time() - t0
    print(f"{args.num_steps} steps in {dt:.1f}s ({args.num_steps/dt:.2f} steps/s)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--length", type=int, default=20)
    p.add_argument("--num-steps", type=int, default=20)
    p.add_argument("--learning-rate", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
