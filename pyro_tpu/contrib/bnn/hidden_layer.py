"""Local-reparameterization BNN hidden layer (ref
``pyro/contrib/bnn/hidden_layer.py``; Kingma, Salimans & Welling 2015)."""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ...distributions import constraints
from ...distributions.distribution import Distribution


class HiddenLayer(Distribution):
    """Distribution over pre-activations h = relu(X @ W) under Gaussian W,
    sampled with the local reparameterization trick: the distribution over
    each unit's pre-activation is Gaussian with moments computed from
    (A_mean, A_scale), so sampling never materializes W."""

    arg_constraints = {}
    has_rsample = True

    def __init__(
        self,
        X=None,
        A_mean=None,
        A_scale=None,
        non_linearity=jax.nn.relu,
        KL_factor: float = 1.0,
        A_prior_scale: float = 1.0,
        include_hidden_bias: bool = True,
        weight_space_sampling: bool = False,
    ):
        self.X = X
        self.A_mean = A_mean
        self.A_scale = A_scale
        self.non_linearity = non_linearity
        self.KL_factor = KL_factor
        self.A_prior_scale = A_prior_scale
        self.include_hidden_bias = include_hidden_bias
        self.weight_space_sampling = weight_space_sampling
        n = X.shape[0]
        h = A_mean.shape[-1]
        out = h + 1 if include_hidden_bias else h
        super().__init__((), (n, out))

    def log_prob(self, value):
        """Returns the (negative) KL term so that using HiddenLayer as a
        guide site yields the correct ELBO (ref ``hidden_layer.py:KL``)."""
        mean = self.A_mean / self.A_prior_scale
        scale = self.A_scale / self.A_prior_scale
        kl = 0.5 * jnp.sum(
            mean**2 + scale**2 - 2 * jnp.log(scale) - 1.0
        )
        return -self.KL_factor * kl

    def rsample(self, key, sample_shape=()):
        if self.weight_space_sampling:
            k = key
            A = self.A_mean + self.A_scale * jax.random.normal(
                k, tuple(sample_shape) + self.A_mean.shape
            )
            activation = self.non_linearity(self.X @ A)
        else:
            # local reparameterization
            mu = self.X @ self.A_mean
            var = (self.X**2) @ (self.A_scale**2)
            eps = jax.random.normal(
                key, tuple(sample_shape) + mu.shape
            )
            activation = self.non_linearity(mu + jnp.sqrt(var) * eps)
        if self.include_hidden_bias:
            ones = jnp.ones(activation.shape[:-1] + (1,))
            activation = jnp.concatenate([activation, ones], axis=-1)
        return activation
