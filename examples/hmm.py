"""Discrete-HMM model zoo trained with TraceEnum_ELBO.

Ref ``/root/reference/examples/hmm.py`` (models 0-3; arXiv:1902.03210 for
the tensor-variable-elimination machinery).  Data is synthetic polyphonic
sequences by default (the environment has no dataset egress); shapes match
the JSB chorales layout (sequences x time x 88 notes, truncated).

Run:  python examples/hmm.py --model 1 --num-steps 20
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import SVI, TraceEnum_ELBO, config_enumerate
from pyro_tpu.ops.indexing import Vindex
from pyro_tpu.optim import Adam


def model_0(sequences, lengths, args, include_prior=True):
    """One HMM per sequence, sequential over sequences and time
    (ref ``examples/hmm.py:model_0``)."""
    num_sequences, max_length, data_dim = sequences.shape
    with poutine.mask(mask=include_prior):
        probs_x = pyro.sample(
            "probs_x",
            dist.Dirichlet(0.9 * jnp.eye(args.hidden_dim) + 0.1).to_event(1),
        )
        probs_y = pyro.sample(
            "probs_y",
            dist.Beta(0.1, 0.9)
            .expand((args.hidden_dim, data_dim))
            .to_event(2),
        )
    tones_plate = pyro.plate("tones", data_dim, dim=-1)
    for i in pyro.plate("sequences", num_sequences):
        length = int(lengths[i])
        sequence = sequences[i, :length]
        x = 0
        for t in pyro.markov(range(length)):
            x = pyro.sample(
                f"x_{i}_{t}",
                dist.Categorical(probs=probs_x[x]),
                infer={"enumerate": "parallel"},
            )
            with tones_plate:
                # drop x's tones-plate placeholder dim before indexing
                # (ref examples/hmm.py model_0: probs_y[x.squeeze(-1)];
                # jnp disallows squeezing axes of 0-d non-enumerated draws)
                x_idx = x[..., 0] if getattr(x, "ndim", 0) else x
                pyro.sample(
                    f"y_{i}_{t}",
                    dist.Bernoulli(probs=probs_y[x_idx]),
                    obs=sequence[t],
                )


def model_1(sequences, lengths, args, include_prior=True):
    """Vectorized over sequences (ref ``examples/hmm.py:model_1``)."""
    num_sequences, max_length, data_dim = sequences.shape
    with poutine.mask(mask=include_prior):
        probs_x = pyro.sample(
            "probs_x",
            dist.Dirichlet(0.9 * jnp.eye(args.hidden_dim) + 0.1).to_event(1),
        )
        probs_y = pyro.sample(
            "probs_y",
            dist.Beta(0.1, 0.9)
            .expand((args.hidden_dim, data_dim))
            .to_event(2),
        )
    tones_plate = pyro.plate("tones", data_dim, dim=-1)
    with pyro.plate("sequences", num_sequences, dim=-2):
        x = jnp.zeros((), jnp.int32)
        for t in pyro.markov(range(max_length)):
            mask_t = (t < lengths)[:, None]
            with poutine.mask(mask=mask_t):
                probs = Vindex(probs_x)[..., x, :]
                x = pyro.sample(
                    f"x_{t}",
                    dist.Categorical(probs=probs),
                    infer={"enumerate": "parallel"},
                )
                with tones_plate:
                    pyro.sample(
                        f"y_{t}",
                        dist.Bernoulli(
                            probs=Vindex(probs_y)[..., x.squeeze(-1), :]
                        ),
                        obs=sequences[:, t],
                    )


def model_2(sequences, lengths, args, include_prior=True):
    """Autoregressive observations y_t depends on (x_t, y_{t-1})
    (ref ``examples/hmm.py:model_2``)."""
    num_sequences, max_length, data_dim = sequences.shape
    with poutine.mask(mask=include_prior):
        probs_x = pyro.sample(
            "probs_x",
            dist.Dirichlet(0.9 * jnp.eye(args.hidden_dim) + 0.1).to_event(1),
        )
        probs_y = pyro.sample(
            "probs_y",
            dist.Beta(0.1, 0.9)
            .expand((args.hidden_dim, 2, data_dim))
            .to_event(3),
        )
    tones_plate = pyro.plate("tones", data_dim, dim=-1)
    with pyro.plate("sequences", num_sequences, dim=-2):
        x = jnp.zeros((), jnp.int32)
        y = jnp.zeros((num_sequences, data_dim))
        for t in pyro.markov(range(max_length)):
            mask_t = (t < lengths)[:, None]
            with poutine.mask(mask=mask_t):
                probs = Vindex(probs_x)[..., x, :]
                x = pyro.sample(
                    f"x_{t}",
                    dist.Categorical(probs=probs),
                    infer={"enumerate": "parallel"},
                )
                with tones_plate:
                    y = pyro.sample(
                        f"y_{t}",
                        dist.Bernoulli(
                            probs=Vindex(probs_y)[
                                ..., x, y.astype(jnp.int32), jnp.arange(data_dim)
                            ]
                        ),
                        obs=sequences[:, t],
                    )


MODELS = {0: model_0, 1: model_1, 2: model_2}


def synthetic_sequences(key, num_sequences, max_length, data_dim, hidden_dim=4):
    """Sample sequences from a random ground-truth HMM."""
    k1, k2, k3 = jax.random.split(key, 3)
    trans = jax.random.dirichlet(
        k1, 0.5 * jnp.ones(hidden_dim), (hidden_dim,)
    )
    emit = jax.random.beta(k2, 0.3, 1.5, (hidden_dim, data_dim))
    hmm = dist.DiscreteHMM(
        jnp.zeros(hidden_dim),
        jnp.log(trans),
        dist.Bernoulli(probs=emit[None].repeat(1, axis=0)).to_event(1).expand((1, hidden_dim)),
        duration=max_length,
    )
    ys = hmm.sample(k3, (num_sequences,))
    lengths = jnp.full((num_sequences,), max_length)
    return ys.astype(jnp.float32), lengths


def main(args):
    import functools

    import numpy as np

    pyro.set_rng_seed(args.seed)
    sequences, lengths = synthetic_sequences(
        jax.random.key(args.seed),
        args.num_sequences,
        args.max_length,
        args.data_dim,
    )
    # close over static config and lengths (static shapes under jit)
    lengths_np = np.asarray(jax.device_get(lengths))
    base_model = MODELS[args.model]

    def model(sequences):
        return base_model(sequences, lengths_np, args)

    from pyro_tpu.infer.autoguide import AutoDelta

    guide = AutoDelta(
        poutine.block(model, expose=["probs_x", "probs_y"])
    )
    elbo = TraceEnum_ELBO(max_plate_nesting=2)
    svi = SVI(model, guide, Adam({"lr": args.learning_rate}), elbo)

    t0 = time.time()
    for step in range(args.num_steps):
        loss = svi.step(sequences)
        if step % 5 == 0:
            print(f"step {step: 4d}  loss = {loss / sequences.size:.4f}")
    dt = time.time() - t0
    print(
        f"{args.num_steps} steps in {dt:.1f}s "
        f"({args.num_steps / dt:.2f} steps/s)"
    )


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", type=int, default=1)
    p.add_argument("--hidden-dim", type=int, default=8)
    p.add_argument("--num-sequences", type=int, default=20)
    p.add_argument("--max-length", type=int, default=32)
    p.add_argument("--data-dim", type=int, default=16)
    p.add_argument("--num-steps", type=int, default=20)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
