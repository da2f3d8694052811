"""Conditional VAE for image inpainting (Sohn et al. 2015).

Ref ``examples/cvae/{baseline,cvae,main}.py`` condensed to one file: given
the visible quadrant(s) of an image, predict the masked quadrants.  A
deterministic baseline net is trained first with a supervised BCE loss;
the CVAE then learns p(y|x,z) with a conditional prior p(z|x) modulated by
the baseline's initial guess y_hat (the "recurrent connection",
ref ``cvae.py:73-87``), and a recognition net q(z|x,y).

TPU-native notes: the baseline is plain flax+optax supervised training
(the reference trains it with raw torch too, ref ``baseline.py``); the
CVAE step is one jitted SVI program.  The baseline's parameters are
frozen inside the model via ``lax.stop_gradient`` closure (ref
``cvae.py:75-79`` ``torch.no_grad``).  Synthetic pseudo-digits stand in
for MNIST (no dataset egress).

Run:  python examples/cvae.py --num-epochs 3
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import optax

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.nn import flax_module
from pyro_tpu.optim import Adam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

SIDE = 28
D = SIDE * SIDE
Z_DIM = 64
H1, H2 = 256, 256


class BaselineNet(nn.Module):
    """Deterministic inpainting net (ref ``baseline.py``)."""

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(H1)(x))
        h = nn.relu(nn.Dense(H2)(h))
        return nn.sigmoid(nn.Dense(D)(h))


class Encoder(nn.Module):
    """q(z|x,y) / p(z|x,y_hat) net (ref ``cvae.py:16-37``)."""

    @nn.compact
    def __call__(self, x, y):
        # overlay the prediction/label on the masked (-1) pixels
        xc = jnp.where(x == -1.0, y, x)
        h = nn.relu(nn.Dense(H1)(xc))
        h = nn.relu(nn.Dense(H2)(h))
        loc = nn.Dense(Z_DIM)(h)
        scale = jnp.exp(jnp.clip(nn.Dense(Z_DIM)(h), -5.0, 5.0))
        return loc, scale


class Decoder(nn.Module):
    """p(y|x,z) generation net (ref ``cvae.py:40-52``)."""

    @nn.compact
    def __call__(self, z):
        h = nn.relu(nn.Dense(H1)(z))
        h = nn.relu(nn.Dense(H2)(h))
        return nn.sigmoid(nn.Dense(D)(h))


def make_model_and_guide(baseline_apply):
    """Build CVAE model/guide closed over the frozen baseline net."""

    def nets():
        prior_net = flax_module(
            "cvae$$$prior_net",
            Encoder(),
            jnp.zeros((1, D)),
            jnp.zeros((1, D)),
        )
        generation_net = flax_module(
            "cvae$$$generation_net", Decoder(), jnp.zeros((1, Z_DIM))
        )
        recognition_net = flax_module(
            "cvae$$$recognition_net",
            Encoder(),
            jnp.zeros((1, D)),
            jnp.zeros((1, D)),
        )
        return prior_net, generation_net, recognition_net

    def model(xs, ys=None, mask=None):
        prior_net, generation_net, _ = nets()
        with pyro.plate("data", xs.shape[0]):
            y_hat = jax.lax.stop_gradient(baseline_apply(xs))
            prior_loc, prior_scale = prior_net(xs, y_hat)
            zs = pyro.sample(
                "z", dist.Normal(prior_loc, prior_scale).to_event(1)
            )
            loc = generation_net(zs)
            if ys is not None:
                # score only the masked pixels (ref cvae.py:89-97); the
                # mask is static per quadrant config, so instead of
                # gathering we zero out visible-pixel terms.
                pyro.sample(
                    "y",
                    dist.Bernoulli(
                        jnp.clip(loc, 1e-6, 1 - 1e-6)
                    )
                    .mask(mask)
                    .to_event(1),
                    obs=jnp.where(mask, ys, 0.0),
                )
            else:
                pyro.deterministic("y", loc)
            return loc

    def guide(xs, ys=None, mask=None):
        prior_net, _, recognition_net = nets()
        with pyro.plate("data", xs.shape[0]):
            if ys is None:
                y_hat = jax.lax.stop_gradient(baseline_apply(xs))
                loc, scale = prior_net(xs, y_hat)
            else:
                loc, scale = recognition_net(xs, ys)
            pyro.sample("z", dist.Normal(loc, scale).to_event(1))

    return model, guide


def synthetic_quadrant_data(key, n: int, num_quadrant_inputs: int = 1):
    """Pseudo-digits split into visible input + full target.

    Input xs: visible quadrant pixels, -1 in masked region.
    Target ys: the full image.  mask: True on pixels to predict.
    """
    k1, k2, k3 = jax.random.split(key, 3)
    protos = (
        jax.random.uniform(k1, (10, D)) < 0.25
    ).astype(jnp.float32)
    labels = jax.random.randint(k2, (n,), 0, 10)
    probs = protos[labels] * 0.85 + 0.075
    ys = (jax.random.uniform(k3, (n, D)) < probs).astype(jnp.float32)
    img = jnp.arange(D).reshape(SIDE, SIDE)
    q_visible = []
    quads = [
        (img[: SIDE // 2, : SIDE // 2]),
        (img[: SIDE // 2, SIDE // 2 :]),
        (img[SIDE // 2 :, : SIDE // 2]),
    ]
    for q in quads[:num_quadrant_inputs]:
        q_visible.append(q.reshape(-1))
    visible = jnp.concatenate(q_visible)
    vis_mask = jnp.zeros(D, bool).at[visible].set(True)
    xs = jnp.where(vis_mask, ys, -1.0)
    mask = ~vis_mask  # pixels to predict
    return xs, ys, mask


def train_baseline(key, xs, ys, mask, num_steps: int, lr: float):
    """Supervised BCE on the masked pixels (ref ``baseline.py``)."""
    net = BaselineNet()
    params = net.init(key, xs[:1])
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            pred = jnp.clip(net.apply(p, xs), 1e-6, 1 - 1e-6)
            bce = -(
                ys * jnp.log(pred) + (1 - ys) * jnp.log1p(-pred)
            )
            return (bce * mask).sum() / xs.shape[0]

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(num_steps):
        params, opt_state, loss = step(params, opt_state)
    return lambda x: net.apply(params, x), float(loss)


def main(args):
    pyro.set_rng_seed(args.seed)
    key = jax.random.key(args.seed)
    xs, ys, mask = synthetic_quadrant_data(
        key, args.num_data, args.num_quadrant_inputs
    )
    n_train = int(0.9 * args.num_data)

    baseline_apply, bl_loss = train_baseline(
        key,
        xs[:n_train],
        ys[:n_train],
        mask,
        args.baseline_steps,
        args.learning_rate,
    )
    print(f"baseline final BCE: {bl_loss:.2f}")

    model, guide = make_model_and_guide(baseline_apply)
    svi = SVI(
        model, guide, Adam({"lr": args.learning_rate}), Trace_ELBO()
    )
    bs = args.batch_size
    for epoch in range(args.num_epochs):
        total = 0.0
        nb = max(1, n_train // bs)
        for i in range(nb):
            total += float(
                svi.step(
                    xs[i * bs : (i + 1) * bs],
                    ys[i * bs : (i + 1) * bs],
                    mask,
                )
            )
        val = float(
            svi.evaluate_loss(xs[n_train:], ys[n_train:], mask)
        )
        print(
            f"epoch {epoch}: train elbo-loss {total / nb:.1f} "
            f"val {val:.1f}"
        )
    return val


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-epochs", type=int, default=5)
    p.add_argument("--num-data", type=int, default=2000)
    p.add_argument("--num-quadrant-inputs", type=int, default=1)
    p.add_argument("--batch-size", type=int, default=100)
    p.add_argument("--baseline-steps", type=int, default=200)
    p.add_argument("--learning-rate", type=float, default=1e-3)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
