"""SSM-vs-kernel-GP log_prob identity (ports the reference's
``tests/contrib/timeseries/test_gp.py:98-128``): the IndependentMaternGP
state-space filter must give the SAME marginal likelihood as a vanilla
GP with the corresponding Matern kernel plus observation noise.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.gp.kernels import Exponential, Matern32, Matern52
from pyro_tpu.contrib.timeseries import IndependentMaternGP

KERNELS = {0.5: Exponential, 1.5: Matern32, 2.5: Matern52}


@pytest.mark.parametrize("nu", [0.5, 1.5, 2.5])
@pytest.mark.parametrize("obs_dim", [1, 2])
@pytest.mark.parametrize("T", [11, 37])
def test_independent_matern_gp_matches_kernel_gp(nu, obs_dim, T):
    pyro.clear_param_store()
    dt = 0.37
    ls = 0.5 + jax.random.uniform(jax.random.key(0), (obs_dim,))
    ks = 0.5 + jax.random.uniform(jax.random.key(1), (obs_dim,))
    ons = 0.5 + jax.random.uniform(jax.random.key(2), (obs_dim,))
    gp = IndependentMaternGP(
        nu=nu,
        dt=dt,
        obs_dim=obs_dim,
        length_scale_init=ls,
        kernel_scale_init=ks,
        obs_noise_scale_init=ons,
    )
    targets = jax.random.normal(jax.random.key(3), (T, obs_dim))
    ssm_lp = np.asarray(gp.log_prob(targets))
    assert ssm_lp.shape == (obs_dim,)

    times = dt * jnp.arange(T, dtype=jnp.float32)[:, None]
    for d in range(obs_dim):
        kernel = KERNELS[nu](
            input_dim=1,
            lengthscale=jnp.asarray([float(ls[d])]),
            variance=jnp.asarray([float(ks[d]) ** 2]),
        )
        K = kernel(times) + float(ons[d]) ** 2 * jnp.eye(T)
        mvn = dist.MultivariateNormal(
            jnp.zeros(T), covariance_matrix=K
        )
        expected = float(mvn.log_prob(targets[:, d]))
        np.testing.assert_allclose(
            float(ssm_lp[d]), expected, rtol=1e-3, atol=1e-2
        )
