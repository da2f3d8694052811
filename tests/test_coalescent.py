"""Coalescent distribution tests (mirrors
``tests/distributions/test_coalescent.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyro_tpu.distributions import (
    CoalescentRateLikelihood,
    CoalescentTimes,
    CoalescentTimesWithRate,
)
from pyro_tpu.distributions.coalescent import (
    CoalescentTimesConstraint,
    _sample_coalescent_times,
)


@pytest.mark.parametrize("num_leaves", [2, 3, 5, 11, 20])
def test_sample_is_valid(num_leaves):
    key = jax.random.key(num_leaves)
    leaf_times = jax.random.normal(key, (num_leaves,))
    coal_times = _sample_coalescent_times(key, leaf_times)
    assert bool(CoalescentTimesConstraint(leaf_times).check(coal_times))

    leaf_times = jnp.zeros(num_leaves)
    coal_times = _sample_coalescent_times(key, leaf_times)
    assert bool(CoalescentTimesConstraint(leaf_times).check(coal_times))


@pytest.mark.parametrize("batch_shape", [(), (6,), (2, 3)], ids=str)
@pytest.mark.parametrize("num_leaves", [2, 5, 11])
def test_simple_smoke(num_leaves, batch_shape):
    key = jax.random.key(0)
    leaf_times = (
        jax.random.uniform(key, batch_shape + (num_leaves,)) ** 0.5 * 9
    )
    d = CoalescentTimes(leaf_times)
    coal_times = d.sample(jax.random.key(1), (7,))
    assert coal_times.shape == (7,) + batch_shape + (num_leaves - 1,)
    lp = d.log_prob(coal_times)
    assert lp.shape == (7,) + batch_shape
    assert np.isfinite(np.asarray(lp)).all()


@pytest.mark.parametrize("batch_shape", [(), (4,)], ids=str)
@pytest.mark.parametrize("num_leaves", [2, 7, 11])
def test_log_prob_unit_rate(num_leaves, batch_shape):
    """CoalescentTimesWithRate with all-ones grid == CoalescentTimes."""
    num_steps = 9
    key = jax.random.key(2)
    leaf_times = (
        jax.random.uniform(key, batch_shape + (num_leaves,)) ** 0.5
        * num_steps
    )
    d1 = CoalescentTimes(leaf_times)
    d2 = CoalescentTimesWithRate(
        leaf_times, jnp.ones(batch_shape + (num_steps,))
    )
    coal_times = d1.sample(jax.random.key(3), (5,))
    assert np.allclose(
        np.asarray(d1.log_prob(coal_times)),
        np.asarray(d2.log_prob(coal_times)),
        atol=1e-4,
    )


@pytest.mark.parametrize("num_leaves", [2, 7])
def test_log_prob_scale(num_leaves):
    """Time-rescaling relates constant-rate models (ref test_log_prob_scale)."""
    num_steps = 9
    k1, k2 = jax.random.split(jax.random.key(4))
    rate = jnp.exp(jax.random.normal(k1, ()))
    leaf_times_1 = jax.random.uniform(k2, (num_leaves,)) ** 0.5 * num_steps
    d1 = CoalescentTimes(leaf_times_1)
    coal_times_1 = d1.sample(jax.random.key(5), (5,))
    log_prob_1 = d1.log_prob(coal_times_1)

    leaf_times_2 = leaf_times_1 / rate
    coal_times_2 = coal_times_1 / rate
    d2 = CoalescentTimes(leaf_times_2, rate)
    log_prob_2 = d2.log_prob(coal_times_2)

    log_abs_det_jacobian = -coal_times_2.shape[-1] * jnp.log(rate)
    assert np.allclose(
        np.asarray(log_prob_1 - log_abs_det_jacobian),
        np.asarray(log_prob_2),
        atol=1e-4,
    )


@pytest.mark.parametrize("num_leaves", [2, 7, 11])
def test_log_prob_constant_rate(num_leaves):
    """Constant grid == CoalescentTimes with that rate
    (ref test_log_prob_constant_rate_2)."""
    num_steps = 9
    k1, k2 = jax.random.split(jax.random.key(6))
    rate = jnp.exp(jax.random.normal(k1, ()))
    rate_grid = jnp.full((num_steps,), rate)
    leaf_times = jax.random.uniform(k2, (num_leaves,)) ** 0.5 * num_steps

    d1 = CoalescentTimes(leaf_times, rate)
    coal_times = d1.sample(jax.random.key(7), (5,))
    d2 = CoalescentTimesWithRate(leaf_times, rate_grid)
    assert np.allclose(
        np.asarray(d1.log_prob(coal_times)),
        np.asarray(d2.log_prob(coal_times)),
        atol=1e-4,
    )


@pytest.mark.parametrize("clamped", [True, False], ids=["clamped", "unclamped"])
@pytest.mark.parametrize("num_steps", [2, 5, 20])
@pytest.mark.parametrize("num_leaves", [2, 5, 10])
def test_likelihood_vectorized(num_leaves, num_steps, clamped):
    key = jax.random.key(num_leaves * 100 + num_steps)
    k1, k2, k3 = jax.random.split(key, 3)
    if clamped:
        leaf_times = (
            jax.random.uniform(k1, (num_leaves,)) ** 0.5 * num_steps
        )
        coal_times = jnp.clip(
            CoalescentTimes(leaf_times).sample(k2), 0.0
        )
    else:
        leaf_times = (
            jax.random.normal(k1, (num_leaves,)) * 0.25 + 0.75
        ) * num_steps
        coal_times = CoalescentTimes(leaf_times).sample(k2)

    rate_grid = jax.random.uniform(k3, (num_steps,)) + 0.5

    d = CoalescentTimesWithRate(leaf_times, rate_grid)
    expected = d.log_prob(coal_times)

    likelihood = CoalescentRateLikelihood(leaf_times, coal_times, num_steps)
    actual = jnp.sum(likelihood(rate_grid), -1)
    assert np.allclose(float(actual), float(expected), atol=1e-3), (
        float(actual),
        float(expected),
    )
    # sequential evaluation agrees too
    seq = sum(
        float(likelihood(rate_grid[..., t], t)) for t in range(num_steps)
    )
    assert np.allclose(seq, float(expected), atol=1e-3)


def test_with_rate_jit_and_grad():
    """log_prob is jittable and differentiable wrt the rate grid — the
    path used when a rate trajectory is a latent function of R0."""
    num_leaves, num_steps = 6, 8
    k1, k2 = jax.random.split(jax.random.key(8))
    leaf_times = jax.random.uniform(k1, (num_leaves,)) ** 0.5 * num_steps
    coal_times = jnp.clip(CoalescentTimes(leaf_times).sample(k2), 0.0)

    def loss(log_rates):
        d = CoalescentTimesWithRate(leaf_times, jnp.exp(log_rates))
        return -d.log_prob(coal_times)

    g = jax.jit(jax.grad(loss))(jnp.zeros(num_steps))
    assert g.shape == (num_steps,)
    assert np.isfinite(np.asarray(g)).all()
