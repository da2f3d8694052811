"""CEVAE smoke + sign-recovery test (mirrors ``tests/contrib/cevae``)."""

import pytest
import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
from pyro_tpu.contrib.cevae import CEVAE
from pyro_tpu.nn import clear_module_registry

pytestmark = pytest.mark.stage("integration")


def test_cevae_recovers_effect_sign():
    pyro.clear_param_store()
    clear_module_registry()
    key = jax.random.key(0)
    N, D = 256, 5
    k1, k2, k3, k4 = jax.random.split(key, 4)
    z = jax.random.normal(k1, (N,))
    x = z[:, None] + 0.5 * jax.random.normal(k2, (N, D))
    t = (jax.random.uniform(k3, (N,)) < jax.nn.sigmoid(z)).astype(jnp.float32)
    # true treatment effect = +2
    y = z + 2.0 * t + 0.3 * jax.random.normal(k4, (N,))

    cevae = CEVAE(feature_dim=D, latent_dim=4, hidden_dim=32)
    losses = cevae.fit(x, t, y, num_epochs=400, learning_rate=3e-3)
    assert losses[-1] < losses[0]
    ite = cevae.ite(x, num_samples=30)
    ate = float(jnp.mean(ite))
    assert 0.8 < ate < 3.2, ate
