"""LogNormalNegativeBinomial quadrature density (ports the reference's
``tests/distributions/test_log_normal_negative_binomial.py``): the
Gauss-Hermite-quadrature pmf normalizes and matches the advertised
mean/variance.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist


@pytest.mark.parametrize("total_count", [1.0, 4.0])
@pytest.mark.parametrize("noise_scale", [0.1, 0.5])
def test_lnnb_mean_variance(total_count, noise_scale, N=2048):
    logits = jnp.asarray(2.0)
    d = dist.LogNormalNegativeBinomial(
        total_count, logits, noise_scale, num_quad_points=128
    )
    values = jnp.arange(N, dtype=jnp.float32)
    probs = jnp.exp(d.log_prob(values))
    np.testing.assert_allclose(float(probs.sum()), 1.0, atol=1e-5)
    expected_mean = float((probs * values).sum())
    np.testing.assert_allclose(expected_mean, float(d.mean), rtol=1e-4)
    expected_var = float((probs * (values - d.mean) ** 2).sum())
    np.testing.assert_allclose(
        expected_var, float(d.variance), rtol=1e-3
    )
