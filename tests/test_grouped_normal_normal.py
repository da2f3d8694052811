"""GroupedNormalNormal marginal likelihood + posterior (ports the
reference's ``tests/distributions/test_grouped_normal_normal.py``):
group-indexed conjugate marginal equals a Monte Carlo integral over the
prior.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu.distributions as dist


def test_grouped_normal_normal(num_groups=3, num_samples=10**5):
    k = jax.random.split(jax.random.key(0), 4)
    prior_scale = jax.random.uniform(k[0], (num_groups,)) + 0.1
    prior_loc = jax.random.normal(k[1], (num_groups,))
    group_idx = jnp.concatenate(
        [
            jnp.arange(num_groups),
            jnp.arange(num_groups),
            jnp.zeros(2, jnp.int32),
        ]
    )
    values = jax.random.normal(k[2], group_idx.shape)
    obs_scale = jax.random.uniform(k[3], group_idx.shape) + 0.1

    gnn = dist.GroupedNormalNormal(
        prior_loc, prior_scale, obs_scale, group_idx
    )
    assert gnn.log_prob(values).shape == ()
    posterior = gnn.get_posterior(values)
    assert posterior.loc.shape == posterior.scale.shape == (num_groups,)

    # correctness: single group vs antithetic MC integral over the prior
    prior_scale = 1.0 + jax.random.uniform(jax.random.key(4), (1,))
    prior_loc = jax.random.normal(jax.random.key(5), (1,))
    group_idx = jnp.zeros(2, jnp.int32)
    values = jax.random.normal(jax.random.key(6), group_idx.shape)
    obs_scale = 0.5 + jax.random.uniform(jax.random.key(7), group_idx.shape)

    gnn = dist.GroupedNormalNormal(
        prior_loc, prior_scale, obs_scale, group_idx
    )
    actual = float(gnn.log_prob(values))

    z = prior_scale * jax.random.normal(
        jax.random.key(8), (num_samples // 2, 1)
    )
    z = jnp.concatenate([prior_loc + z, prior_loc - z])
    ll = dist.Normal(z, obs_scale).log_prob(values).sum(-1)
    expected = float(
        jax.scipy.special.logsumexp(ll) - math.log(num_samples)
    )
    np.testing.assert_allclose(actual, expected, atol=0.005)

    # posterior agrees with the analytic conjugate update
    post = gnn.get_posterior(values)
    prec = 1 / prior_scale**2 + jnp.sum(1 / obs_scale**2)
    expected_loc = (
        prior_loc / prior_scale**2 + jnp.sum(values / obs_scale**2)
    ) / prec
    np.testing.assert_allclose(
        float(post.loc[0]), float(expected_loc[0]), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(post.scale[0]), float(prec[0] ** -0.5), rtol=1e-4
    )
