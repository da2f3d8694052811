"""Discrete-HMM model zoo trained with TraceEnum_ELBO.

Ref ``/root/reference/examples/hmm.py`` (models 0-7; arXiv:1902.03210 for
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




# -- models 3-7 (ref ``examples/hmm.py:316-612``) -----------------------------

try:
    import flax.linen as fnn
except ImportError:  # pragma: no cover
    fnn = None


def model_3(sequences, lengths, args, include_prior=True):
    """Factorial HMM: two independent hidden chains w, x
    (ref ``examples/hmm.py:model_3``)."""
    num_sequences, max_length, data_dim = sequences.shape
    hidden = int(args.hidden_dim**0.5)
    with poutine.mask(mask=include_prior):
        probs_w = pyro.sample(
            "probs_w",
            dist.Dirichlet(0.9 * jnp.eye(hidden) + 0.1).to_event(1),
        )
        probs_x = pyro.sample(
            "probs_x",
            dist.Dirichlet(0.9 * jnp.eye(hidden) + 0.1).to_event(1),
        )
        probs_y = pyro.sample(
            "probs_y",
            dist.Beta(0.1, 0.9)
            .expand((hidden, hidden, data_dim))
            .to_event(3),
        )
    tones_plate = pyro.plate("tones", data_dim, dim=-1)
    with pyro.plate("sequences", num_sequences, dim=-2):
        w = jnp.zeros((), jnp.int32)
        x = jnp.zeros((), jnp.int32)
        for t in pyro.markov(range(max_length)):
            mask_t = (t < lengths)[:, None]
            with poutine.mask(mask=mask_t):
                w = pyro.sample(
                    f"w_{t}",
                    dist.Categorical(probs=Vindex(probs_w)[..., w, :]),
                    infer={"enumerate": "parallel"},
                )
                x = pyro.sample(
                    f"x_{t}",
                    dist.Categorical(probs=Vindex(probs_x)[..., x, :]),
                    infer={"enumerate": "parallel"},
                )
                with tones_plate:
                    pyro.sample(
                        f"y_{t}",
                        dist.Bernoulli(
                            probs=Vindex(probs_y)[
                                ..., w.squeeze(-1), x.squeeze(-1), :
                            ]
                        ),
                        obs=sequences[:, t],
                    )


def model_4(sequences, lengths, args, include_prior=True):
    """Dynamic Bayesian network: x depends on both w and previous x
    (ref ``examples/hmm.py:model_4``)."""
    num_sequences, max_length, data_dim = sequences.shape
    hidden = int(args.hidden_dim**0.5)
    with poutine.mask(mask=include_prior):
        probs_w = pyro.sample(
            "probs_w",
            dist.Dirichlet(0.9 * jnp.eye(hidden) + 0.1).to_event(1),
        )
        probs_x = pyro.sample(
            "probs_x",
            dist.Dirichlet(0.9 * jnp.eye(hidden) + 0.1)
            .expand((hidden, hidden))
            .to_event(2),
        )
        probs_y = pyro.sample(
            "probs_y",
            dist.Beta(0.1, 0.9)
            .expand((hidden, hidden, data_dim))
            .to_event(3),
        )
    tones_plate = pyro.plate("tones", data_dim, dim=-1)
    with pyro.plate("sequences", num_sequences, dim=-2):
        w = jnp.zeros((), jnp.int32)
        x = jnp.zeros((), jnp.int32)
        for t in pyro.markov(range(max_length)):
            mask_t = (t < lengths)[:, None]
            with poutine.mask(mask=mask_t):
                w = pyro.sample(
                    f"w_{t}",
                    dist.Categorical(probs=Vindex(probs_w)[..., w, :]),
                    infer={"enumerate": "parallel"},
                )
                x = pyro.sample(
                    f"x_{t}",
                    dist.Categorical(
                        probs=Vindex(probs_x)[..., w, x, :]
                    ),
                    infer={"enumerate": "parallel"},
                )
                with tones_plate:
                    pyro.sample(
                        f"y_{t}",
                        dist.Bernoulli(
                            probs=Vindex(probs_y)[
                                ..., w.squeeze(-1), x.squeeze(-1), :
                            ]
                        ),
                        obs=sequences[:, t],
                    )


if fnn is not None:

    class TonesGenerator(fnn.Module):
        """Neural emitter for models 5 and 7
        (ref ``examples/hmm.py:TonesGenerator``)."""

        hidden_dim: int
        nn_dim: int
        nn_channels: int
        data_dim: int

        @fnn.compact
        def __call__(self, x, y):
            # x: int (..., 1) possibly enumerated; y: (..., data_dim)
            x_onehot = jax.nn.one_hot(x[..., 0], self.hidden_dim)
            y_conv = fnn.relu(
                fnn.Conv(self.nn_channels, (3,), padding="SAME")(
                    y[..., None]
                )
            ).reshape(y.shape[:-1] + (-1,))
            h = fnn.relu(
                fnn.Dense(self.nn_dim)(x_onehot)
                + fnn.Dense(self.nn_dim)(y_conv)
            )
            return fnn.Dense(self.data_dim)(h)


def _tones_generator(args, data_dim):
    from pyro_tpu.nn import flax_module

    return flax_module(
        "tones_generator",
        TonesGenerator(
            hidden_dim=args.hidden_dim,
            nn_dim=args.nn_dim,
            nn_channels=args.nn_channels,
            data_dim=data_dim,
        ),
        jnp.zeros((1, 1), jnp.int32),
        jnp.zeros((1, data_dim)),
    )


def model_5(sequences, lengths, args, include_prior=True):
    """Neural HMM: hidden chain with autoregressive neural emissions
    (ref ``examples/hmm.py:model_5``)."""
    num_sequences, max_length, data_dim = sequences.shape
    tones_generator = _tones_generator(args, data_dim)
    with poutine.mask(mask=include_prior):
        probs_x = pyro.sample(
            "probs_x",
            dist.Dirichlet(
                0.9 * jnp.eye(args.hidden_dim) + 0.1
            ).to_event(1),
        )
    with pyro.plate("sequences", num_sequences, dim=-2):
        x = jnp.zeros((), jnp.int32)
        y = jnp.zeros((num_sequences, data_dim))
        for t in pyro.markov(range(max_length)):
            mask_t = (t < lengths)[:, None]
            with poutine.mask(mask=mask_t):
                x = pyro.sample(
                    f"x_{t}",
                    dist.Categorical(probs=Vindex(probs_x)[..., x, :]),
                    infer={"enumerate": "parallel"},
                )
                # each tone depends on all tones at the previous step, so
                # each step gets its own tones plate (ref model_5)
                with pyro.plate(f"tones_{t}", data_dim, dim=-1):
                    y = pyro.sample(
                        f"y_{t}",
                        dist.Bernoulli(
                            logits=tones_generator(x, y)
                        ),
                        obs=sequences[:, t],
                    )


def model_6(sequences, lengths, args, include_prior=False):
    """Second-order HMM (2-markov), probability tables as pyro.param;
    optional Raftery mixture parameterization
    (ref ``examples/hmm.py:model_6``)."""
    num_sequences, max_length, data_dim = sequences.shape
    hidden_dim = args.hidden_dim
    key = jax.random.key(0)
    if not getattr(args, "raftery_parameterization", False):
        probs_x = pyro.param(
            "probs_x",
            jax.random.uniform(
                key, (hidden_dim, hidden_dim, hidden_dim)
            ),
            constraint=dist.constraints.simplex,
        )
    else:
        probs_x1 = pyro.param(
            "probs_x1",
            jax.random.uniform(key, (hidden_dim, hidden_dim)),
            constraint=dist.constraints.simplex,
        )
        probs_x2 = pyro.param(
            "probs_x2",
            jax.random.uniform(
                jax.random.fold_in(key, 1), (hidden_dim, hidden_dim)
            ),
            constraint=dist.constraints.simplex,
        )
        mix_lambda = pyro.param(
            "mix_lambda",
            jnp.asarray(0.5),
            constraint=dist.constraints.unit_interval,
        )
        probs_x = (
            mix_lambda * probs_x1
            + (1.0 - mix_lambda) * probs_x2[:, None, :]
        )
    probs_y = pyro.param(
        "probs_y",
        jax.random.uniform(
            jax.random.fold_in(key, 2), (hidden_dim, data_dim)
        ),
        constraint=dist.constraints.unit_interval,
    )
    tones_plate = pyro.plate("tones", data_dim, dim=-1)
    with pyro.plate("sequences", num_sequences, dim=-2):
        x_curr = jnp.zeros((), jnp.int32)
        x_prev = jnp.zeros((), jnp.int32)
        for t in pyro.markov(range(max_length), history=2):
            mask_t = (t < lengths)[:, None]
            with poutine.mask(mask=mask_t):
                probs_x_t = Vindex(probs_x)[..., x_prev, x_curr, :]
                x_prev, x_curr = x_curr, pyro.sample(
                    f"x_{t}",
                    dist.Categorical(probs=probs_x_t),
                    infer={"enumerate": "parallel"},
                )
                with tones_plate:
                    pyro.sample(
                        f"y_{t}",
                        dist.Bernoulli(
                            probs=Vindex(probs_y)[
                                ..., x_curr.squeeze(-1), :
                            ]
                        ),
                        obs=sequences[:, t],
                    )


def model_7(sequences, lengths, args, include_prior=True):
    """model_5 fused into a single DiscreteHMM sample statement — the
    exact-marginalization fast path (ref ``examples/hmm.py:model_7``)."""
    num_sequences, max_length, data_dim = sequences.shape
    tones_generator = _tones_generator(args, data_dim)
    with poutine.mask(mask=include_prior):
        probs_x = pyro.sample(
            "probs_x",
            dist.Dirichlet(
                0.9 * jnp.eye(args.hidden_dim) + 0.1
            ).to_event(1),
        )
    with pyro.plate("sequences", num_sequences, dim=-1):
        y = sequences  # (seq, T, D)
        x = jnp.arange(args.hidden_dim)[:, None]  # (H, 1)
        init_logits = jnp.full((args.hidden_dim,), -jnp.inf).at[0].set(0.0)
        trans_logits = jnp.log(probs_x)
        # logits: (seq, T, H, D) — generator applied to every state at
        # every step in one batched call
        logits = tones_generator(x, y[..., None, :])
        obs_dist = dist.Bernoulli(logits=logits).to_event(1)
        t_arr = jnp.arange(max_length)
        obs_dist = obs_dist.mask((t_arr < lengths[:, None])[..., None])
        hmm_dist = dist.DiscreteHMM(init_logits, trans_logits, obs_dist)
        pyro.sample("y", hmm_dist, obs=y)


def model_1v(sequences, lengths, args, include_prior=True):
    """model_1 with the time dimension *vectorized* via
    ``pyro.vectorized_markov`` — one traced transition factor with time
    as a tensor axis, eliminated by the O(log T) parallel-scan markov
    product instead of unrolling T Python steps (ref
    ``examples/contrib/funsor/hmm.py:592`` model_7).  Sequences batch
    at dim=-3, time at dim=-2, tones at dim=-1."""
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
    with pyro.plate("sequences", num_sequences, dim=-3) as batch:
        lengths_b = lengths[batch]
        batch = batch[:, None]
        x_prev = 0
        for t in pyro.vectorized_markov(
            name="time", size=max_length, dim=-2
        ):
            with poutine.mask(
                mask=(t < lengths_b[:, None])[..., None]
            ):
                x_curr = pyro.sample(
                    f"x_{t}",
                    dist.Categorical(Vindex(probs_x)[..., x_prev, :]),
                    infer={"enumerate": "parallel"},
                )
                with tones_plate:
                    pyro.sample(
                        f"y_{t}",
                        dist.Bernoulli(
                            Vindex(probs_y)[..., x_curr.squeeze(-1), :]
                        ),
                        obs=Vindex(sequences)[batch, t],
                    )
                x_prev = x_curr


MODELS = {
    0: model_0,
    1: model_1,
    2: model_2,
    3: model_3,
    4: model_4,
    5: model_5,
    6: model_6,
    7: model_7,
    "1v": model_1v,
}



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
        poutine.block(
            model,
            expose_fn=lambda msg: msg["name"].startswith("probs_"),
        )
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
    p.add_argument("--nn-dim", type=int, default=32)
    p.add_argument("--nn-channels", type=int, default=2)
    p.add_argument("--raftery-parameterization", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
