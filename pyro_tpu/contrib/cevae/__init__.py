"""Causal-effect VAE (ref ``pyro/contrib/cevae/__init__.py``; Louizos et
al. 2017 "Causal Effect Inference with Deep Latent-Variable Models").

Binary treatment t, outcome y, proxies x of latent confounder z:

    z ~ N(0, I);  x ~ p(x|z);  t ~ Bernoulli(f(z));  y ~ p(y|t,z)

``CEVAE.fit`` trains model+guide by SVI; ``CEVAE.ite`` estimates
individual treatment effects E[y|x,do(t=1)] - E[y|x,do(t=0)].
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from ...infer import SVI, Trace_ELBO
from ...nn import flax_module
from ...optim import ClippedAdam

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None


class _MLP(nn.Module):
    out_dim: int
    hidden: int = 64

    @nn.compact
    def __call__(self, x):
        h = nn.elu(nn.Dense(self.hidden)(x))
        h = nn.elu(nn.Dense(self.hidden)(h))
        return nn.Dense(self.out_dim)(h)


class CEVAE:
    """Ref ``cevae/__init__.py:470``."""

    def __init__(
        self,
        feature_dim: int,
        outcome_dist: str = "normal",
        latent_dim: int = 20,
        hidden_dim: int = 64,
        num_samples: int = 100,
    ):
        assert outcome_dist in ("normal", "bernoulli")
        self.feature_dim = feature_dim
        self.latent_dim = latent_dim
        self.hidden_dim = hidden_dim
        self.outcome_dist = outcome_dist
        self.num_samples = num_samples

    # -- networks (created lazily through the param store) -------------------
    def _nets(self):
        D, Z, H = self.feature_dim, self.latent_dim, self.hidden_dim
        zx = jnp.zeros((1, Z))
        xty = jnp.zeros((1, D + 2))
        return {
            "x_nn": flax_module("cevae$x_nn", _MLP(2 * D, H), zx),
            "t_nn": flax_module("cevae$t_nn", _MLP(1, H), zx),
            "y0_nn": flax_module("cevae$y0_nn", _MLP(2, H), zx),
            "y1_nn": flax_module("cevae$y1_nn", _MLP(2, H), zx),
            "guide_z": flax_module(
                "cevae$guide_z", _MLP(2 * Z, H), xty
            ),
        }

    # -- model / guide ---------------------------------------------------------
    def model(self, x, t=None, y=None, size=None):
        nets = self._nets()
        N = x.shape[0]
        with pyro.plate("data", N):
            z = pyro.sample(
                "z",
                dist.Normal(
                    jnp.zeros(self.latent_dim), 1.0
                ).to_event(1),
            )
            x_params = nets["x_nn"](z)
            x_loc, x_logscale = jnp.split(x_params, 2, axis=-1)
            pyro.sample(
                "x",
                dist.Normal(
                    x_loc, jnp.exp(jnp.clip(x_logscale, -5, 5))
                ).to_event(1),
                obs=x,
            )
            t_logits = nets["t_nn"](z)[..., 0]
            t_sample = pyro.sample(
                "t", dist.Bernoulli(logits=t_logits), obs=t
            )
            y0 = nets["y0_nn"](z)
            y1 = nets["y1_nn"](z)
            params = jnp.where(t_sample[..., None] > 0.5, y1, y0)
            if self.outcome_dist == "normal":
                y_dist = dist.Normal(
                    params[..., 0],
                    jnp.exp(jnp.clip(params[..., 1], -5, 5)),
                )
            else:
                y_dist = dist.Bernoulli(logits=params[..., 0])
            y_sample = pyro.sample("y", y_dist, obs=y)
        return y_sample

    def guide(self, x, t=None, y=None, size=None):
        nets = self._nets()
        N = x.shape[0]
        t_feat = (
            t if t is not None else jnp.zeros(N)
        )[..., None]
        y_feat = (y if y is not None else jnp.zeros(N))[..., None]
        inp = jnp.concatenate([x, t_feat, y_feat], axis=-1)
        z_params = nets["guide_z"](inp)
        z_loc, z_logscale = jnp.split(z_params, 2, axis=-1)
        with pyro.plate("data", N):
            pyro.sample(
                "z",
                dist.Normal(
                    z_loc, jnp.exp(jnp.clip(z_logscale, -5, 5))
                ).to_event(1),
            )

    # -- training / inference ----------------------------------------------------
    def fit(
        self,
        x,
        t,
        y,
        *,
        num_epochs: int = 100,
        learning_rate: float = 1e-3,
        log_every: int = 0,
    ):
        svi = SVI(
            self.model,
            self.guide,
            ClippedAdam({"lr": learning_rate, "clip_norm": 10.0}),
            Trace_ELBO(),
        )
        losses = []
        for epoch in range(num_epochs):
            loss = svi.step(x, t, y)
            losses.append(loss)
            if log_every and epoch % log_every == 0:
                print(f"epoch {epoch} loss = {loss / x.shape[0]:.4f}")
        return losses

    def ite(self, x, num_samples: Optional[int] = None, rng_key=None):
        """Individual treatment effect E[y|x,do(1)] - E[y|x,do(0)]
        (ref ``cevae/__init__.py:ite``)."""
        from ... import poutine

        num_samples = num_samples or self.num_samples
        if rng_key is None:
            rng_key = jax.random.key(7)
        keys = jax.random.split(rng_key, num_samples)
        N = x.shape[0]

        def one(key):
            k1, k2 = jax.random.split(key)
            guide_trace = poutine.trace(
                poutine.seed(
                    lambda: self.guide(x), rng_key=k1
                )
            ).get_trace()
            nets = self._nets()
            z = guide_trace.nodes["z"]["value"]
            y0 = nets["y0_nn"](z)[..., 0]
            y1 = nets["y1_nn"](z)[..., 0]
            if self.outcome_dist == "bernoulli":
                y0 = jax.nn.sigmoid(y0)
                y1 = jax.nn.sigmoid(y1)
            return y1 - y0

        ites = jax.vmap(one)(keys)
        return jnp.mean(ites, axis=0)
