"""Sparse Gamma Deep Exponential Family (ref
``examples/sparse_gamma_def.py``; Ranganath et al. 2015).

Three layers of Gamma latents with Gamma-prior weights and a Poisson
likelihood, trained with a mean-field Gamma guide.  Uses synthetic count
data (the reference downloads the Olivetti faces).  All three layer
matmuls batch over the data plate onto the MXU; the whole step is one
XLA program.

Run: ``python examples/sparse_gamma_def.py -n 200``
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, TraceMeanField_ELBO
from pyro_tpu.optim import ClippedAdam

softplus = jax.nn.softplus


class SparseGammaDEF:
    def __init__(self, image_size=256):
        self.top_width = 100
        self.mid_width = 40
        self.bottom_width = 15
        self.image_size = image_size
        self.alpha_z = 0.1
        self.beta_z = 0.1
        self.alpha_w = 0.1
        self.beta_w = 0.3
        self.alpha_init = 0.5
        self.mean_init = 0.0
        self.sigma_init = 0.1

    def model(self, x):
        x_size = x.shape[0]
        with pyro.plate("w_top_plate", self.top_width * self.mid_width):
            w_top = pyro.sample(
                "w_top", dist.Gamma(self.alpha_w, self.beta_w)
            )
        with pyro.plate("w_mid_plate", self.mid_width * self.bottom_width):
            w_mid = pyro.sample(
                "w_mid", dist.Gamma(self.alpha_w, self.beta_w)
            )
        with pyro.plate(
            "w_bottom_plate", self.bottom_width * self.image_size
        ):
            w_bottom = pyro.sample(
                "w_bottom", dist.Gamma(self.alpha_w, self.beta_w)
            )

        with pyro.plate("data", x_size):
            z_top = pyro.sample(
                "z_top",
                dist.Gamma(self.alpha_z, self.beta_z)
                .expand((self.top_width,))
                .to_event(1),
            )
            w_top_m = w_top.reshape(
                w_top.shape[:-1] + (self.top_width, self.mid_width)
            )
            mean_mid = z_top @ w_top_m
            z_mid = pyro.sample(
                "z_mid",
                dist.Gamma(self.alpha_z, self.beta_z / mean_mid).to_event(1),
            )
            w_mid_m = w_mid.reshape(
                w_mid.shape[:-1] + (self.mid_width, self.bottom_width)
            )
            mean_bottom = z_mid @ w_mid_m
            z_bottom = pyro.sample(
                "z_bottom",
                dist.Gamma(
                    self.alpha_z, self.beta_z / mean_bottom
                ).to_event(1),
            )
            w_bottom_m = w_bottom.reshape(
                w_bottom.shape[:-1] + (self.bottom_width, self.image_size)
            )
            mean_obs = z_bottom @ w_bottom_m
            pyro.sample(
                "obs", dist.Poisson(mean_obs).to_event(1), obs=x
            )

    def guide(self, x):
        x_size = x.shape[0]
        rs = np.random.RandomState(1)

        def rand_init(shape):
            return jnp.asarray(
                self.mean_init + self.sigma_init * rs.randn(*shape),
                jnp.float32,
            )

        def sample_zs(name, width):
            alpha_z_q = pyro.param(
                f"alpha_z_q_{name}",
                self.alpha_init + self.sigma_init * rand_init((x_size, width)),
            )
            mean_z_q = pyro.param(
                f"mean_z_q_{name}", rand_init((x_size, width))
            )
            alpha, mean = softplus(alpha_z_q), softplus(mean_z_q)
            pyro.sample(
                f"z_{name}", dist.Gamma(alpha, alpha / mean).to_event(1)
            )

        def sample_ws(name, width):
            alpha_w_q = pyro.param(
                f"alpha_w_q_{name}",
                self.alpha_init + self.sigma_init * rand_init((width,)),
            )
            mean_w_q = pyro.param(f"mean_w_q_{name}", rand_init((width,)))
            alpha, mean = softplus(alpha_w_q), softplus(mean_w_q)
            pyro.sample(f"w_{name}", dist.Gamma(alpha, alpha / mean))

        with pyro.plate("w_top_plate", self.top_width * self.mid_width):
            sample_ws("top", self.top_width * self.mid_width)
        with pyro.plate("w_mid_plate", self.mid_width * self.bottom_width):
            sample_ws("mid", self.mid_width * self.bottom_width)
        with pyro.plate(
            "w_bottom_plate", self.bottom_width * self.image_size
        ):
            sample_ws("bottom", self.bottom_width * self.image_size)

        with pyro.plate("data", x_size):
            sample_zs("top", self.top_width)
            sample_zs("mid", self.mid_width)
            sample_zs("bottom", self.bottom_width)


def main(args):
    pyro.set_rng_seed(0)
    pyro.clear_param_store()
    def_model = SparseGammaDEF(image_size=args.image_size)

    # synthetic sparse count data with DEF-like structure
    rng = np.random.RandomState(0)
    z = rng.gamma(0.5, 2.0, size=(args.num_data, def_model.bottom_width))
    w = rng.gamma(0.3, 1.0, size=(def_model.bottom_width, args.image_size))
    x = jnp.asarray(rng.poisson(z @ w), jnp.float32)

    opt = ClippedAdam({"lr": args.learning_rate, "clip_norm": 10.0})
    svi = SVI(def_model.model, def_model.guide, opt, TraceMeanField_ELBO())
    losses = []
    for step in range(args.num_steps):
        loss = svi.step(x)
        losses.append(loss)
        if step % 50 == 0:
            print(f"{step: >5d}\t{loss / x.size:.4f}")
    print(f"final loss per entry = {losses[-1] / x.size:.4f}")
    return losses


if __name__ == "__main__":
    parser = argparse.ArgumentParser(description="Sparse Gamma DEF")
    parser.add_argument("-n", "--num-steps", default=1000, type=int)
    parser.add_argument("-d", "--num-data", default=64, type=int)
    parser.add_argument("-s", "--image-size", default=256, type=int)
    parser.add_argument("-lr", "--learning-rate", default=4.5, type=float)
    main(parser.parse_args())
