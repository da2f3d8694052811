"""Semi-supervised VAE (Kingma et al. M2 model).

Ref ``examples/vae/ss_vae_M2.py``: a generative model
p(x | y, z) p(y) p(z) over images x, class labels y (observed for a
fraction of the data) and a continuous style latent z.  Unsupervised
batches marginalize y exactly by parallel enumeration (TraceEnum_ELBO);
an auxiliary scaled classification loss (ref :198-212) trains
q(y | x) on the supervised subset.

TPU-native notes: the supervised and unsupervised steps are two separate
jitted SVI programs (shapes are static per program); networks are flax
modules registered via ``flax_module``.  Data is synthetic class-clustered
binarized images (no dataset egress in this environment).

Run:  python examples/ss_vae_M2.py --num-epochs 3
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import SVI, Trace_ELBO, TraceEnum_ELBO, config_enumerate
from pyro_tpu.nn import flax_module
from pyro_tpu.optim import Adam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

INPUT_SIZE = 784
OUTPUT_SIZE = 10
Z_DIM = 50
HIDDEN = 500


def _broadcast_cat(a, b):
    """Concatenate along the feature dim, broadcasting batch dims.

    The enumeration of y prepends an enum dim to one input only; the
    reference handles this with its ``allow_broadcast`` MLP wrapper
    (ref ``examples/vae/utils/custom_mlp.py``).
    """
    shape = jnp.broadcast_shapes(a.shape[:-1], b.shape[:-1])
    a = jnp.broadcast_to(a, shape + a.shape[-1:])
    b = jnp.broadcast_to(b, shape + b.shape[-1:])
    return jnp.concatenate([a, b], -1)


class EncoderY(nn.Module):
    """q(y|x) classifier net (ref MLP encoder_y, :77-83)."""

    @nn.compact
    def __call__(self, x):
        h = nn.softplus(nn.Dense(HIDDEN)(x))
        return nn.softmax(nn.Dense(OUTPUT_SIZE)(h))


class EncoderZ(nn.Module):
    """q(z|x,y) style net (ref MLP encoder_z, :89-95)."""

    @nn.compact
    def __call__(self, x, y):
        h = nn.softplus(nn.Dense(HIDDEN)(_broadcast_cat(x, y)))
        loc = nn.Dense(Z_DIM)(h)
        scale = jnp.exp(jnp.clip(nn.Dense(Z_DIM)(h), -5.0, 5.0))
        return loc, scale


class Decoder(nn.Module):
    """p(x|y,z) image net (ref MLP decoder, :97-103)."""

    @nn.compact
    def __call__(self, z, y):
        h = nn.softplus(nn.Dense(HIDDEN)(_broadcast_cat(z, y)))
        return nn.sigmoid(nn.Dense(INPUT_SIZE)(h))


def _nets():
    decoder = flax_module(
        "ss_vae$$$decoder",
        Decoder(),
        jnp.zeros((1, Z_DIM)),
        jnp.zeros((1, OUTPUT_SIZE)),
    )
    encoder_y = flax_module(
        "ss_vae$$$encoder_y", EncoderY(), jnp.zeros((1, INPUT_SIZE))
    )
    encoder_z = flax_module(
        "ss_vae$$$encoder_z",
        EncoderZ(),
        jnp.zeros((1, INPUT_SIZE)),
        jnp.zeros((1, OUTPUT_SIZE)),
    )
    return decoder, encoder_y, encoder_z


def model(xs, ys=None):
    """p(z)=N(0,I), p(y)=Cat(1/10), p(x|y,z)=Bern(decoder(y,z)) (ref :109-150)."""
    decoder, _, _ = _nets()
    batch_size = xs.shape[0]
    with pyro.plate("data", batch_size):
        zs = pyro.sample(
            "z", dist.Normal(jnp.zeros(Z_DIM), 1.0).to_event(1)
        )
        alpha_prior = jnp.ones(OUTPUT_SIZE) / OUTPUT_SIZE
        ys = pyro.sample(
            "y", dist.OneHotCategorical(alpha_prior), obs=ys
        )
        loc = decoder(zs, ys)
        pyro.sample(
            "x",
            dist.Bernoulli(jnp.clip(loc, 1e-6, 1 - 1e-6)).to_event(1),
            obs=xs,
        )
        return loc


def guide(xs, ys=None):
    """q(y|x)=Cat(alpha(x)), q(z|x,y)=N(loc, scale) (ref :152-177)."""
    _, encoder_y, encoder_z = _nets()
    with pyro.plate("data", xs.shape[0]):
        if ys is None:
            alpha = encoder_y(xs)
            ys = pyro.sample("y", dist.OneHotCategorical(alpha))
        loc, scale = encoder_z(xs, ys)
        pyro.sample("z", dist.Normal(loc, scale).to_event(1))


def model_classify(xs, ys, aux_loss_multiplier=46.0):
    """Auxiliary supervised loss on q(y|x) (ref :198-212)."""
    _, encoder_y, _ = _nets()
    with pyro.plate("data", xs.shape[0]):
        alpha = encoder_y(xs)
        with poutine.scale(scale=aux_loss_multiplier):
            pyro.sample("y_aux", dist.OneHotCategorical(alpha), obs=ys)


def guide_classify(xs, ys, aux_loss_multiplier=46.0):
    pass


def classifier(xs):
    """Hard classification from q(y|x) (ref :179-196)."""
    _, encoder_y, _ = _nets()
    alpha = encoder_y(xs)
    return jax.nn.one_hot(jnp.argmax(alpha, -1), OUTPUT_SIZE)


def synthetic_data(key, n: int, noise: float = 0.15):
    """Class-clustered binarized pseudo-images with labels."""
    k1, k2, k3 = jax.random.split(key, 3)
    prototypes = (
        jax.random.uniform(k1, (OUTPUT_SIZE, INPUT_SIZE)) < 0.25
    ).astype(jnp.float32)
    labels = jax.random.randint(k2, (n,), 0, OUTPUT_SIZE)
    probs = prototypes[labels] * (1 - noise) + noise / 2
    xs = (jax.random.uniform(k3, (n, INPUT_SIZE)) < probs).astype(
        jnp.float32
    )
    return xs, jax.nn.one_hot(labels, OUTPUT_SIZE)


def main(args):
    pyro.set_rng_seed(args.seed)
    key = jax.random.key(args.seed)
    xs, ys = synthetic_data(key, args.num_data)
    n_sup = int(args.num_data * args.sup_fraction)
    xs_sup, ys_sup = xs[:n_sup], ys[:n_sup]
    xs_unsup = xs[n_sup:]

    guide_enum = config_enumerate(guide, "parallel", expand=True)
    optim = Adam({"lr": args.learning_rate})
    loss_main = TraceEnum_ELBO(max_plate_nesting=1)
    svi_main = SVI(model, guide_enum, optim, loss_main)
    svi_aux = SVI(model_classify, guide_classify, optim, Trace_ELBO())

    bs = args.batch_size
    n_sup_b, n_unsup_b = max(1, n_sup // bs), max(
        1, (args.num_data - n_sup) // bs
    )
    for epoch in range(args.num_epochs):
        sup_loss = unsup_loss = aux_loss = 0.0
        for i in range(n_unsup_b):
            unsup_loss += float(
                svi_main.step(xs_unsup[i * bs : (i + 1) * bs])
            )
        for i in range(n_sup_b):
            xb = xs_sup[i * bs : (i + 1) * bs]
            yb = ys_sup[i * bs : (i + 1) * bs]
            sup_loss += float(svi_main.step(xb, yb))
            aux_loss += float(
                svi_aux.step(xb, yb, args.aux_loss_multiplier)
            )
        preds = classifier(xs_sup)
        acc = float((preds.argmax(-1) == ys_sup.argmax(-1)).mean())
        print(
            f"epoch {epoch}: sup={sup_loss / max(n_sup_b, 1):.1f} "
            f"unsup={unsup_loss / n_unsup_b:.1f} "
            f"aux={aux_loss / max(n_sup_b, 1):.1f} train-acc={acc:.3f}"
        )
    return acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-epochs", type=int, default=5)
    p.add_argument("--num-data", type=int, default=2000)
    p.add_argument("--sup-fraction", type=float, default=0.1)
    p.add_argument("--batch-size", type=int, default=200)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--aux-loss-multiplier", type=float, default=46.0)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
