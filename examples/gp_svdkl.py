"""Stochastic variational deep kernel learning (SV-DKL).

Ref ``examples/contrib/gp/sv-dkl.py`` (Wilson et al. 2016): a neural
feature extractor warped into an RBF kernel (``gp.kernels.Warping``),
with a VariationalSparseGP + MultiClass likelihood classifying images by
the GP posterior over extracted features.

TPU-native notes: the feature extractor is a flax MLP registered with
``flax_module`` so its parameters train jointly with the GP's variational
parameters in one jitted SVI step.  Synthetic class-clustered images
stand in for MNIST.

Run:  python examples/gp_svdkl.py --num-steps 300
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.contrib.gp as gp
from pyro_tpu.infer import SVI, TraceMeanField_ELBO
from pyro_tpu.nn import flax_module
from pyro_tpu.optim import Adam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

D_IN = 64
NUM_CLASSES = 4
FEATURES = 10


class CNN(nn.Module):
    """Feature extractor (the reference uses a conv net on 28x28 MNIST;
    here an MLP on flat synthetic images)."""

    @nn.compact
    def __call__(self, x):
        h = nn.relu(nn.Dense(64)(x))
        return nn.Dense(FEATURES)(h)


def synthetic_images(key, n):
    k1, k2, k3 = jax.random.split(key, 3)
    protos = jax.random.normal(k1, (NUM_CLASSES, D_IN))
    labels = jax.random.randint(k2, (n,), 0, NUM_CLASSES)
    x = protos[labels] + 0.7 * jax.random.normal(k3, (n, D_IN))
    return x, labels


def main(args):
    pyro.set_rng_seed(args.seed)
    X, y = synthetic_images(jax.random.key(args.seed), args.num_data)
    n_train = int(0.8 * args.num_data)
    Xtr, ytr = X[:n_train], y[:n_train]

    cnn_fn = lambda x: flax_module(
        "dkl$$$cnn", CNN(), jnp.zeros((1, D_IN))
    )(x)
    rbf = gp.kernels.RBF(
        input_dim=FEATURES, lengthscale=jnp.ones(FEATURES)
    )
    deep_kernel = gp.kernels.Warping(rbf, iwarping_fn=cnn_fn)

    # inducing points: a subset of training inputs (ref sv-dkl.py:120)
    Xu = Xtr[:: max(1, n_train // args.num_inducing)][: args.num_inducing]
    likelihood = gp.likelihoods.MultiClass(num_classes=NUM_CLASSES)
    gpmodule = gp.models.VariationalSparseGP(
        Xtr,
        ytr,
        deep_kernel,
        Xu=Xu,
        likelihood=likelihood,
        latent_shape=(NUM_CLASSES,),
        num_data=n_train,
        whiten=True,
        jitter=1e-3,
    )
    svi = SVI(
        gpmodule.model,
        gpmodule.guide,
        Adam({"lr": args.learning_rate}),
        TraceMeanField_ELBO(),
    )
    losses = svi.run_steps(args.num_steps)
    print(
        f"loss: first={float(losses[0]):.1f} last={float(losses[-1]):.1f}"
    )

    # evaluate train/test accuracy via the GP predictive mean
    f_loc, _ = gpmodule(X)
    pred = jnp.argmax(f_loc, 0)
    train_acc = float((pred[:n_train] == y[:n_train]).mean())
    test_acc = float((pred[n_train:] == y[n_train:]).mean())
    print(f"accuracy: train={train_acc:.3f} test={test_acc:.3f}")
    return test_acc


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-data", type=int, default=500)
    p.add_argument("--num-inducing", type=int, default=30)
    p.add_argument("--num-steps", type=int, default=500)
    p.add_argument("--learning-rate", type=float, default=0.005)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
