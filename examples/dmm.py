"""Deep Markov Model (ref ``examples/dmm.py``; Krishnan et al. 2017).

Reference architecture, at reference widths: gated transitions
(transition_dim=200), 3-layer emitter (emission_dim=100), and an
amortized guide whose future summary h(x_{t:T}) is a 600-wide backward
RNN over the observations (ref ``examples/dmm.py:154-181`` — there a
``torch.nn.RNN(nonlinearity='relu')`` run on the reversed minibatch;
here ``pyro_tpu.nn.RNN(cell='relu', reverse=True)``, a ``lax.scan``
whose input projections are hoisted into one MXU matmul).  Trainable
``z_0``/``z_q_0``/``h_0`` as in the reference; optional IAFs in the
variational distribution (``--num-iafs``, ref ``:183-186``).

Synthetic polyphonic-music-like data by default (JSB regime: 88 tones).
"""

from __future__ import annotations

import argparse
import time

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions.transforms import affine_autoregressive
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.nn import RNN, flax_module
from pyro_tpu.optim import ClippedAdam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

# the reference example's JSB-chorales regime (ref examples/dmm.py:153-160:
# 88 tones, z=100, emission_dim=100, transition_dim=200, rnn_dim=600)
Z_DIM = 100
X_DIM = 88
TRANS_DIM = 200
EMISSION_DIM = 100
RNN_DIM = 600


class GatedTransition(nn.Module):
    """p(z_t | z_{t-1}) params (ref examples/dmm.py:69-113)."""

    @nn.compact
    def __call__(self, z):
        gate = nn.sigmoid(nn.Dense(Z_DIM)(nn.relu(nn.Dense(TRANS_DIM)(z))))
        prop_mean = nn.Dense(Z_DIM)(nn.relu(nn.Dense(TRANS_DIM)(z)))
        # the z->loc skip connection initializes to the identity map,
        # as the reference does (lin_z_to_loc.weight = eye)
        loc = (1 - gate) * nn.Dense(
            Z_DIM,
            kernel_init=lambda *a: jnp.eye(Z_DIM),
            bias_init=nn.initializers.zeros,
        )(z) + gate * prop_mean
        scale = nn.softplus(nn.Dense(Z_DIM)(nn.relu(prop_mean))) + 1e-3
        return loc, scale


class Emitter(nn.Module):
    """p(x_t | z_t) bernoulli logits (ref examples/dmm.py:43-66: three
    linear layers, two relus)."""

    @nn.compact
    def __call__(self, z):
        h1 = nn.relu(nn.Dense(EMISSION_DIM)(z))
        h2 = nn.relu(nn.Dense(EMISSION_DIM)(h1))
        return nn.Dense(X_DIM)(h2)


class Combiner(nn.Module):
    """q(z_t | z_{t-1}, x_{t:T}) params (ref examples/dmm.py:116-144):
    combine z_{t-1} (projected to rnn_dim) with the RNN hidden state."""

    @nn.compact
    def __call__(self, z_prev, h_rnn):
        h = 0.5 * (nn.tanh(nn.Dense(RNN_DIM)(z_prev)) + h_rnn)
        loc = nn.Dense(Z_DIM)(h)
        scale = nn.softplus(nn.Dense(Z_DIM)(h)) + 1e-3
        return loc, scale


def model(sequences, annealing_factor=1.0):
    """p(x, z): the whole z chain is ONE ``NormalMarkovChain`` site —
    identical joint density to the reference's T-step loop, but scoring
    a guide path teacher-forces the gated transition over all T steps
    in one batched MXU matmul set, and the T emitter MLPs batch into
    one (B*T, .) call.  (Ref examples/dmm.py:287-310 writes the same
    factorization as T sites.)"""
    B, T, _ = sequences.shape
    trans = flax_module("transition", GatedTransition(), jnp.zeros((1, Z_DIM)))
    emitter = flax_module("emitter", Emitter(), jnp.zeros((1, Z_DIM)))
    z_0 = pyro.param("z_0", jnp.zeros(Z_DIM))
    with pyro.plate("sequences", B, dim=-1):
        with pyro.poutine.scale(scale=annealing_factor):
            z = pyro.sample(
                "z",
                dist.NormalMarkovChain(
                    lambda z_prev, _: trans(z_prev),
                    jnp.broadcast_to(z_0, (B, Z_DIM)),
                    length=T,
                ),
            )
        logits = emitter(z)  # one batched (B*T, .) MLP
        pyro.sample(
            "x",
            dist.Bernoulli(logits=logits).to_event(2),
            obs=sequences,
        )


def guide(sequences, annealing_factor=1.0, num_iafs=0):
    """q(z | x): backward RNN over the observations + a combiner chain,
    as ONE ``NormalMarkovChain`` site conditioned on the RNN summaries.
    The ancestral draw is the unavoidable sequential part (a lax.scan
    of the combiner); its log-density teacher-forces in parallel."""
    B, T, _ = sequences.shape
    combiner = flax_module(
        "combiner",
        Combiner(),
        jnp.zeros((1, Z_DIM)),
        jnp.zeros((1, RNN_DIM)),
    )
    # the reference's rnn: torch.nn.RNN(input_size=88, hidden_size=600,
    # nonlinearity='relu') run over the reversed sequence so its output
    # at t summarizes x_{t:T}; reverse=True does that in one lax.scan
    rnn = flax_module(
        "rnn",
        RNN(features=RNN_DIM, cell="relu", reverse=True),
        jnp.zeros((B, T, X_DIM)),
    )
    h_0 = pyro.param("h_0", jnp.zeros(RNN_DIM))
    z_q_0 = pyro.param("z_q_0", jnp.zeros(Z_DIM))
    h, _ = rnn(sequences, jnp.broadcast_to(h_0, (1, B, RNN_DIM)))
    iafs = [
        affine_autoregressive(f"iaf_{i}", Z_DIM, hidden_dims=[50])
        for i in range(num_iafs)
    ]
    with pyro.plate("sequences", B, dim=-1):
        with pyro.poutine.scale(scale=annealing_factor):
            pyro.sample(
                "z",
                dist.NormalMarkovChain(
                    lambda z_prev, h_t: combiner(z_prev, h_t),
                    jnp.broadcast_to(z_q_0, (B, Z_DIM)),
                    xs=h,
                    transforms=iafs,
                ),
            )


def synthetic_data(key, batch, T):
    k1, k2 = jax.random.split(key)
    basis = jax.random.normal(k1, (Z_DIM, X_DIM))
    z = jnp.cumsum(0.3 * jax.random.normal(k2, (batch, T, Z_DIM)), axis=1)
    probs = jax.nn.sigmoid(z @ basis)
    return (jax.random.uniform(k2, probs.shape) < probs).astype(jnp.float32)


def main(args):
    pyro.set_rng_seed(args.seed)
    data = synthetic_data(jax.random.key(args.seed), args.batch_size, args.length)
    svi = SVI(
        model,
        lambda seqs, annealing_factor=1.0: guide(
            seqs, annealing_factor, num_iafs=args.num_iafs
        ),
        ClippedAdam({"lr": args.learning_rate, "clip_norm": 10.0}),
        Trace_ELBO(),
    )
    t0 = time.time()
    for step in range(args.num_steps):
        # KL annealing over the first half of training (ref :406-418)
        af = min(1.0, args.min_af + (1.0 - args.min_af) * (step + 1) / max(1, args.num_steps // 2))
        loss = svi.step(data, af)
        if step % 5 == 0:
            print(f"step {step: 4d} loss = {loss / data.size:.4f}")
    dt = time.time() - t0
    print(f"{args.num_steps} steps in {dt:.1f}s ({args.num_steps/dt:.2f} steps/s)")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--length", type=int, default=20)
    p.add_argument("--num-steps", type=int, default=20)
    p.add_argument("--num-iafs", type=int, default=0)
    p.add_argument("--min-af", type=float, default=0.2)
    p.add_argument("--learning-rate", type=float, default=3e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
