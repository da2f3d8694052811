"""MaskedDistribution and Independent semantics (ports the core of the
reference's ``tests/distributions/test_mask.py`` +
``test_independent.py``): mask shape/value algebra across batch, event,
and mask dims; masked-KL additivity; to_event composition.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.distributions import kl_divergence
from pyro_tpu.distributions.util import scale_and_mask


def checker_mask(shape):
    if not shape:
        return jnp.asarray(True)
    idx = sum(
        jnp.arange(s).reshape((s,) + (1,) * (len(shape) - 1 - i))
        for i, s in enumerate(shape)
    )
    return (idx % 2) == 0


@pytest.mark.parametrize("batch_dim,event_dim,mask_dim", [
    (b, e, m)
    for b in range(3)
    for e in range(2)
    for m in range(b + 1)
])
def test_mask(batch_dim, event_dim, mask_dim):
    shape = tuple([2, 3, 4, 5, 6][: batch_dim + event_dim])
    batch_shape = shape[:batch_dim]
    mask_shape = batch_shape[batch_dim - mask_dim :]
    base = dist.Bernoulli(0.1).expand(shape).to_event(event_dim)
    mask = checker_mask(mask_shape)
    d = base.mask(mask)

    sample = base.sample(jax.random.key(0))
    assert d.batch_shape == base.batch_shape
    assert d.event_shape == base.event_shape
    assert d.log_prob(sample).shape == base.log_prob(sample).shape
    np.testing.assert_allclose(
        np.asarray(d.log_prob(sample)),
        np.asarray(
            scale_and_mask(base.log_prob(sample), mask=mask)
        ),
        rtol=1e-6,
    )
    if not d.event_shape:
        np.testing.assert_allclose(
            np.asarray(d.enumerate_support()),
            np.asarray(base.enumerate_support()),
        )


def test_masked_kl_additivity():
    k1, k2, k3, k4 = jax.random.split(jax.random.key(0), 4)
    mask = jnp.asarray([[False, True], [True, True]])
    p = dist.Normal(
        jax.random.normal(k1, (2, 2)), jnp.exp(jax.random.normal(k2, (2, 2)))
    )
    q = dist.Normal(
        jax.random.normal(k3, (2, 2)), jnp.exp(jax.random.normal(k4, (2, 2)))
    )
    expected = kl_divergence(p.to_event(2), q.to_event(2))
    actual = kl_divergence(
        p.mask(mask).to_event(2), q.mask(mask).to_event(2)
    ) + kl_divergence(
        p.mask(~mask).to_event(2), q.mask(~mask).to_event(2)
    )
    np.testing.assert_allclose(
        float(actual), float(expected), rtol=1e-5
    )


@pytest.mark.parametrize("shape", [(), (4,), (3, 2)], ids=str)
def test_mask_all_true_matches_base(shape):
    base = dist.Normal(jnp.zeros(shape), jnp.ones(shape))
    d = base.mask(True)
    x = base.sample(jax.random.key(1))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(x)), np.asarray(base.log_prob(x)), rtol=1e-6
    )


def test_mask_false_zeros_log_prob():
    base = dist.Normal(jnp.zeros(3), jnp.ones(3))
    d = base.mask(False)
    x = base.sample(jax.random.key(2))
    np.testing.assert_allclose(np.asarray(d.log_prob(x)), 0.0)


# -- Independent / to_event -------------------------------------------------


@pytest.mark.parametrize("reinterpreted", [0, 1, 2])
def test_independent_shapes(reinterpreted):
    base = dist.Normal(jnp.zeros((2, 3, 4)), jnp.ones((2, 3, 4)))
    d = base.to_event(reinterpreted)
    assert d.batch_shape == (2, 3, 4)[: 3 - reinterpreted]
    assert d.event_shape == (2, 3, 4)[3 - reinterpreted :]
    x = d.sample(jax.random.key(0))
    assert x.shape == (2, 3, 4)
    lp = d.log_prob(x)
    assert lp.shape == d.batch_shape
    np.testing.assert_allclose(
        np.asarray(lp),
        np.asarray(
            base.log_prob(x).sum(
                axis=tuple(range(-reinterpreted, 0)) if reinterpreted else ()
            )
        )
        if reinterpreted
        else np.asarray(base.log_prob(x)),
        rtol=1e-5,
    )


def test_to_event_composes():
    base = dist.Normal(jnp.zeros((2, 3, 4)), 1.0)
    d1 = base.to_event(1).to_event(1)
    d2 = base.to_event(2)
    assert d1.batch_shape == d2.batch_shape
    assert d1.event_shape == d2.event_shape
    x = d2.sample(jax.random.key(0))
    np.testing.assert_allclose(
        np.asarray(d1.log_prob(x)), np.asarray(d2.log_prob(x)), rtol=1e-5
    )


def test_independent_expand():
    d = dist.Normal(jnp.zeros(4), 1.0).to_event(1)
    e = d.expand((5, 3))
    assert e.batch_shape == (5, 3)
    assert e.event_shape == (4,)
    x = e.sample(jax.random.key(0))
    assert x.shape == (5, 3, 4)
    assert e.log_prob(x).shape == (5, 3)
