"""Empirical distribution value tests.

Port of ``/root/reference/tests/distributions/test_empirical.py``:
weighted/unweighted moments, sample shapes, atom log_prob, and coherence
between weights and sampled frequencies.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyro_tpu.distributions import Empirical


@pytest.mark.parametrize("size", [(), (1,), (2, 3)])
def test_unweighted_mean_and_var(size):
    samples = jnp.stack([jnp.ones(size) * i for i in range(5)])
    d = Empirical(samples, jnp.ones(5))
    assert np.allclose(np.asarray(d.mean), 2.0)
    assert np.allclose(np.asarray(d.variance), 2.0)


@pytest.mark.parametrize(
    "batch_shape, event_shape",
    [((), ()), ((2,), ()), ((2,), (5,)), ((2,), (5, 3)), ((2, 5), (3,))],
)
@pytest.mark.parametrize("sample_shape", [(), (20,), (20, 3, 4)])
def test_unweighted_samples(batch_shape, event_shape, sample_shape):
    agg = 5
    # samples laid out as batch + (agg,) + event
    emp_samples = jnp.broadcast_to(
        jnp.arange(agg, dtype=jnp.float32).reshape(
            (agg,) + (1,) * len(event_shape)
        ),
        batch_shape + (agg,) + event_shape,
    )
    weights = jnp.ones(batch_shape + (agg,))
    d = Empirical(emp_samples, weights)
    samples = d.sample(jax.random.PRNGKey(0), sample_shape)
    assert samples.shape == sample_shape + batch_shape + event_shape
    # every atom is one of 0..4, constant across event dims
    vals = np.asarray(samples).reshape(-1, int(np.prod(event_shape or (1,))))
    assert ((vals >= 0) & (vals <= 4)).all()
    assert (vals == vals[:, :1]).all()


@pytest.mark.parametrize(
    "sample, weights, expected_mean, expected_var",
    [
        (
            [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]],
            jnp.ones(2),
            [0.5, 0.5, 0.5],
            [0.25, 0.25, 0.25],
        ),
        (
            [[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]],
            jnp.ones((2, 3)),
            [0.0, 1.0],
            [0.0, 0.0],
        ),
    ],
)
def test_sample_examples(sample, weights, expected_mean, expected_var):
    d = Empirical(jnp.asarray(sample), weights)
    assert np.allclose(np.asarray(d.mean), expected_mean)
    assert np.allclose(np.asarray(d.variance), expected_var)
    num_samples = 10000
    s = np.asarray(d.sample(jax.random.PRNGKey(1), (num_samples,)))
    assert np.abs(s.mean(0) - np.asarray(d.mean)).max() < 0.03
    assert np.abs(s.var(0) - np.asarray(d.variance)).max() < 0.03


@pytest.mark.parametrize(
    "batch_shape, event_shape",
    [((), ()), ((1,), ()), ((10,), ()), ((10, 8), (3,)), ((10, 8), (3, 4))],
)
def test_log_prob(batch_shape, event_shape):
    samples = jnp.stack([jnp.ones(event_shape) * i for i in range(5)])
    samples = jnp.broadcast_to(samples, batch_shape + (5,) + event_shape)
    weights = jnp.ones(batch_shape + (5,))
    d = Empirical(samples, weights)

    value = jnp.broadcast_to(jnp.asarray(1.0), batch_shape + event_shape)
    log_prob = d.log_prob(value)
    assert log_prob.shape == batch_shape
    assert np.allclose(np.asarray(log_prob), np.log(0.2), atol=1e-6)

    # outside the support -> -inf
    log_prob = d.log_prob(value * 6)
    assert log_prob.shape == batch_shape
    assert np.isinf(np.asarray(log_prob)).all()

    # vectorized log_prob is ambiguous and raises (ref empirical.py)
    with pytest.raises(ValueError):
        d.log_prob(jnp.ones((3,) + batch_shape + event_shape))


@pytest.mark.parametrize("event_shape", [(), (1,), (2, 3)])
def test_weighted_sample_coherence(event_shape):
    data = [(1.0, 0.5), (0.0, 1.5), (1.0, 0.5), (0.0, 1.5)]
    samples = jnp.stack([s * jnp.ones(event_shape) for s, _ in data])
    log_weights = jnp.log(jnp.asarray([w for _, w in data]))
    d = Empirical(samples, log_weights)
    assert d.event_shape == event_shape
    assert d.sample_size == 4
    assert np.allclose(
        float(d.log_prob(jnp.ones(event_shape))), np.log(0.25), atol=1e-6
    )
    s = np.asarray(d.sample(jax.random.PRNGKey(2), (1000,))).reshape(1000, -1)
    frac_ones = (s.min(axis=-1) == 1.0).mean()
    assert abs(frac_ones - 0.25) < 0.03
    assert abs((s.max(axis=-1) == 0.0).mean() - 0.75) < 0.03


@pytest.mark.parametrize("batch_shape", [(), (1,), (2,), (2, 3)])
@pytest.mark.parametrize("event_shape", [(), (1,), (2, 3)])
def test_weighted_mean_var(event_shape, batch_shape):
    data = [(1.0, 0.5), (0.0, 1.5), (1.0, 0.5), (0.0, 1.5)]
    samples = jnp.stack([s * jnp.ones(event_shape) for s, _ in data])
    samples = jnp.broadcast_to(samples, batch_shape + (4,) + event_shape)
    log_weights = jnp.broadcast_to(
        jnp.log(jnp.asarray([w for _, w in data])), batch_shape + (4,)
    )
    d = Empirical(samples, log_weights)
    assert np.allclose(np.asarray(d.mean), 0.25, atol=1e-6)
    assert np.allclose(np.asarray(d.variance), 0.1875, atol=1e-6)


def test_mean_var_non_nan():
    true_mean = jax.random.normal(jax.random.PRNGKey(3), (1, 2, 3))
    samples = jnp.broadcast_to(true_mean, (10,) + true_mean.shape)
    # aggregate over the leading dim: samples (1,2,10,3)? keep it simple:
    # batch (1,2), agg 10, event (3,)
    samples = jnp.moveaxis(samples, 0, 2)  # (1, 2, 10, 3)
    d = Empirical(samples, jnp.zeros((1, 2, 10)))
    assert np.isfinite(np.asarray(d.mean)).all()
    assert np.isfinite(np.asarray(d.variance)).all()
    assert np.allclose(np.asarray(d.mean), np.asarray(true_mean), atol=1e-6)
    assert np.allclose(np.asarray(d.variance), 0.0, atol=1e-6)
