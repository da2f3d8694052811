"""scANVI: semi-supervised deep generative model of single-cell RNA-seq.

Ref ``examples/scanvi/scanvi.py``: a hierarchical latent-variable model
over gene-expression counts x with cell-type label y (observed for some
cells), low-level state z2, high-level state z1 and library-size l.
Counts are modeled with a ZeroInflatedNegativeBinomial whose mean is
normalized by a softmax decoder and scaled by l (ref :209-249).  The
unobserved labels are marginalized by TraceEnum_ELBO; labeled cells add
a classification term via ``pyro.factor`` in the guide (ref :262-274).

TPU-native notes: one jitted SVI program per (labeled, unlabeled) batch
shape; MultiStepLR maps to an optax piecewise-constant schedule compiled
into the step.  Synthetic NB-mixture counts stand in for the cortex
dataset (no dataset egress).

Run:  python examples/scanvi.py --num-epochs 5
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, TraceEnum_ELBO, config_enumerate
from pyro_tpu.nn import flax_module
from pyro_tpu.optim import MultiStepLR

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

NUM_GENES = 100
NUM_LABELS = 4
Z_DIM = 10
Z2_DIM = 10
HIDDEN = 128
L_LOC, L_SCALE = 5.0, 0.5
EPSILON = 1e-3


def _broadcast_cat(a, b):
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + a.shape[-1:])
    b = jnp.broadcast_to(b, shape + b.shape[-1:])
    return jnp.concatenate([a, b], -1)


def split_in_half(t):
    """(ref :51-53)"""
    return jnp.split(t, 2, axis=-1)


class Z2Decoder(nn.Module):
    @nn.compact
    def __call__(self, z1, y):
        h = nn.relu(nn.Dense(HIDDEN)(_broadcast_cat(z1, y)))
        loc, scale = split_in_half(nn.Dense(2 * Z2_DIM)(h))
        return loc, nn.softplus(scale) + EPSILON


class XDecoder(nn.Module):
    @nn.compact
    def __call__(self, z2):
        h = nn.relu(nn.Dense(HIDDEN)(z2))
        gate_logits, mu_logits = split_in_half(
            nn.Dense(2 * NUM_GENES)(h)
        )
        return gate_logits, nn.softmax(mu_logits)


class Z2LEncoder(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(HIDDEN)(jnp.log1p(x)))
        out = nn.Dense(2 * Z2_DIM + 2)(h)
        z2_loc = out[..., :Z2_DIM]
        z2_scale = nn.softplus(out[..., Z2_DIM : 2 * Z2_DIM]) + EPSILON
        l_loc = out[..., -2:-1]
        l_scale = nn.softplus(out[..., -1:]) + EPSILON
        return z2_loc, z2_scale, l_loc, l_scale


class Z1Encoder(nn.Module):
    @nn.compact
    def __call__(self, z2, y):
        h = nn.relu(nn.Dense(HIDDEN)(_broadcast_cat(z2, y)))
        loc, scale = split_in_half(nn.Dense(2 * Z_DIM)(h))
        return loc, nn.softplus(scale) + EPSILON


class Classifier(nn.Module):
    @nn.compact
    def __call__(self, z2):
        return nn.Dense(NUM_LABELS)(nn.relu(nn.Dense(HIDDEN)(z2)))


def _nets():
    return dict(
        z2_decoder=flax_module(
            "scanvi$$$z2_decoder",
            Z2Decoder(),
            jnp.zeros((1, Z_DIM)),
            jnp.zeros((1, NUM_LABELS)),
        ),
        x_decoder=flax_module(
            "scanvi$$$x_decoder", XDecoder(), jnp.zeros((1, Z2_DIM))
        ),
        z2l_encoder=flax_module(
            "scanvi$$$z2l_encoder",
            Z2LEncoder(),
            jnp.zeros((1, NUM_GENES)),
        ),
        z1_encoder=flax_module(
            "scanvi$$$z1_encoder",
            Z1Encoder(),
            jnp.zeros((1, Z2_DIM)),
            jnp.zeros((1, NUM_LABELS)),
        ),
        classifier=flax_module(
            "scanvi$$$classifier", Classifier(), jnp.zeros((1, Z2_DIM))
        ),
    )


def model(x, y=None, scale_factor=1.0, alpha=0.01):
    """(ref :209-249)"""
    nets = _nets()
    theta = pyro.param(
        "inverse_dispersion",
        10.0 * jnp.ones(NUM_GENES),
        constraint=constraints.positive,
    )
    with pyro.plate("batch", x.shape[0]), poutine.scale(
        scale=scale_factor
    ):
        z1 = pyro.sample(
            "z1", dist.Normal(jnp.zeros(Z_DIM), 1.0).to_event(1)
        )
        y = pyro.sample(
            "y",
            dist.OneHotCategorical(logits=jnp.zeros(NUM_LABELS)),
            obs=y,
        )
        z2_loc, z2_scale = nets["z2_decoder"](z1, y)
        z2 = pyro.sample("z2", dist.Normal(z2_loc, z2_scale).to_event(1))
        l = pyro.sample(
            "l", dist.LogNormal(L_LOC, L_SCALE).expand((x.shape[0], 1)).to_event(1)
        )
        gate_logits, mu = nets["x_decoder"](z2)
        nb_logits = jnp.log(l * mu + EPSILON) - jnp.log(theta + EPSILON)
        x_dist = dist.ZeroInflatedNegativeBinomial(
            total_count=theta, logits=nb_logits, gate_logits=gate_logits
        )
        pyro.sample("x", x_dist.to_event(1), obs=x)


def guide(x, y=None, scale_factor=1.0, alpha=0.01):
    """(ref :252-277)"""
    nets = _nets()
    with pyro.plate("batch", x.shape[0]), poutine.scale(
        scale=scale_factor
    ):
        z2_loc, z2_scale, l_loc, l_scale = nets["z2l_encoder"](x)
        pyro.sample("l", dist.LogNormal(l_loc, l_scale).to_event(1))
        z2 = pyro.sample("z2", dist.Normal(z2_loc, z2_scale).to_event(1))

        y_logits = nets["classifier"](z2)
        y_dist = dist.OneHotCategorical(logits=y_logits)
        if y is None:
            y = pyro.sample("y", y_dist)
        else:
            # classification loss on labeled cells (ref :262-274)
            classification_loss = y_dist.log_prob(y)
            pyro.factor(
                "classification_loss",
                -alpha * classification_loss,
                has_rsample=False,
            )
        z1_loc, z1_scale = nets["z1_encoder"](z2, y)
        pyro.sample("z1", dist.Normal(z1_loc, z1_scale).to_event(1))


def synthetic_counts(key, n: int):
    """NB-mixture pseudo scRNA-seq counts with 4 cell types."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    profiles = jax.nn.softmax(
        2.0 * jax.random.normal(k1, (NUM_LABELS, NUM_GENES))
    )
    labels = jax.random.randint(k2, (n,), 0, NUM_LABELS)
    lib = jnp.exp(
        L_LOC + L_SCALE * jax.random.normal(k3, (n, 1))
    )
    rate = lib * profiles[labels]
    x = jax.random.poisson(k4, rate).astype(jnp.float32)
    return x, jax.nn.one_hot(labels, NUM_LABELS)


def main(args):
    pyro.set_rng_seed(args.seed)
    x, y = synthetic_counts(jax.random.key(args.seed), args.num_data)
    n_labeled = args.num_data // 2
    scale_factor = 1.0 / (args.batch_size * NUM_GENES)

    scheduler = MultiStepLR(
        {
            "optim_args": {"lr": args.learning_rate},
            "milestones": [20 * max(1, args.num_data // args.batch_size)],
            "gamma": 0.2,
        }
    )
    guide_enum = config_enumerate(guide, "parallel", expand=True)
    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    svi = SVI(model, guide_enum, scheduler, elbo)

    bs = args.batch_size
    for epoch in range(args.num_epochs):
        losses = []
        for i in range(0, n_labeled, bs):
            losses.append(
                float(
                    svi.step(
                        x[i : i + bs], y[i : i + bs], scale_factor,
                        args.alpha,
                    )
                )
            )
        for i in range(n_labeled, args.num_data, bs):
            losses.append(
                float(
                    svi.step(x[i : i + bs], None, scale_factor, args.alpha)
                )
            )
        print("[Epoch %04d]  Loss: %.5f" % (epoch, np.mean(losses)))
    return float(np.mean(losses))


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-epochs", type=int, default=10)
    p.add_argument("--num-data", type=int, default=1000)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--learning-rate", type=float, default=0.005)
    p.add_argument("--alpha", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
