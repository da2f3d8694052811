"""Matching distribution tests (mirrors
``tests/distributions/test_one_one_matching.py`` and
``test_one_two_matching.py``)."""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyro_tpu.distributions import OneOneMatching, OneTwoMatching
from pyro_tpu.distributions.matching import enumerate_one_two_matchings


@pytest.mark.parametrize("num_nodes", [2, 3, 4, 5])
def test_one_one_enumerate(num_nodes):
    d = OneOneMatching(jnp.zeros((num_nodes, num_nodes)))
    support = d.enumerate_support()
    assert support.shape == (math.factorial(num_nodes), num_nodes)
    assert bool(d.support.check(support))


@pytest.mark.parametrize("num_nodes", [2, 3, 4, 5])
def test_one_one_log_prob_full(num_nodes):
    """Exact log_probs sum to 1 over the support."""
    logits = jax.random.normal(jax.random.key(num_nodes), (num_nodes,) * 2)
    d = OneOneMatching(logits)
    support = d.enumerate_support()
    log_total = float(
        jax.scipy.special.logsumexp(jax.vmap(d.log_prob)(support))
    )
    assert abs(log_total) < 1e-3


@pytest.mark.parametrize("num_nodes", [3, 5, 8])
def test_one_one_bethe_close(num_nodes):
    """Bethe log Z approximates the exact log permanent (ref
    test_log_prob_full atol=2.0)."""
    logits = jax.random.normal(jax.random.key(7), (num_nodes,) * 2)
    exact = float(OneOneMatching(logits).log_partition_function)
    bethe = float(
        OneOneMatching(logits, bp_iters=50).log_partition_function
    )
    assert abs(exact - bethe) < 2.0


@pytest.mark.parametrize("num_nodes", [2, 3, 4])
def test_one_one_mode(num_nodes):
    logits = jax.random.normal(jax.random.key(3), (num_nodes,) * 2)
    d = OneOneMatching(logits)
    support = d.enumerate_support()
    lps = jax.vmap(d.log_prob)(support)
    expected = support[int(jnp.argmax(lps))]
    assert np.array_equal(np.asarray(d.mode()), np.asarray(expected))


def test_one_one_sample_frequencies():
    logits = jax.random.normal(jax.random.key(4), (3, 3))
    d = OneOneMatching(logits)
    support = d.enumerate_support()
    samples = d.sample(jax.random.key(5), (4000,))
    probs = np.exp(np.asarray(jax.vmap(d.log_prob)(support)))
    freqs = np.array(
        [
            np.mean((np.asarray(samples) == np.asarray(v)).all(-1))
            for v in support
        ]
    )
    assert np.allclose(freqs, probs, atol=0.05)


def test_one_one_bethe_grad():
    """Bethe log Z is differentiable; its gradient approximates the edge
    marginals (a doubly stochastic matrix)."""
    logits = jax.random.normal(jax.random.key(6), (4, 4))

    def logz(l):
        return OneOneMatching(l, bp_iters=50).log_partition_function

    g = jax.grad(logz)(logits)
    assert np.isfinite(np.asarray(g)).all()
    assert np.allclose(np.asarray(g.sum(-1)), 1.0, atol=0.2)


@pytest.mark.parametrize("num_destins", [1, 2, 3])
def test_one_two_enumerate(num_destins):
    support = enumerate_one_two_matchings(num_destins)
    num_sources = 2 * num_destins
    expected_size = math.factorial(num_sources) // 2**num_destins
    assert support.shape == (expected_size, num_sources)
    d = OneTwoMatching(jnp.zeros((num_sources, num_destins)))
    assert bool(d.support.check(d.enumerate_support()))


@pytest.mark.parametrize("num_destins", [1, 2, 3])
def test_one_two_log_prob_full(num_destins):
    logits = jax.random.normal(
        jax.random.key(num_destins), (2 * num_destins, num_destins)
    )
    d = OneTwoMatching(logits)
    support = d.enumerate_support()
    log_total = float(
        jax.scipy.special.logsumexp(jax.vmap(d.log_prob)(support))
    )
    assert abs(log_total) < 1e-3


@pytest.mark.parametrize("num_destins", [2, 3, 4])
def test_one_two_bethe_close(num_destins):
    logits = jax.random.normal(
        jax.random.key(11), (2 * num_destins, num_destins)
    )
    exact = float(OneTwoMatching(logits).log_partition_function)
    bethe = float(
        OneTwoMatching(logits, bp_iters=50).log_partition_function
    )
    assert abs(exact - bethe) < 2.0


@pytest.mark.parametrize("num_destins", [2, 3])
def test_one_two_mode(num_destins):
    logits = jax.random.normal(
        jax.random.key(13), (2 * num_destins, num_destins)
    )
    d = OneTwoMatching(logits)
    support = d.enumerate_support()
    lps = jax.vmap(d.log_prob)(support)
    expected = float(jnp.max(lps))
    actual = float(d.log_prob(d.mode()))
    assert np.allclose(actual, expected, atol=1e-5)


def test_one_two_sample_frequencies():
    logits = jax.random.normal(jax.random.key(14), (4, 2))
    d = OneTwoMatching(logits)
    support = d.enumerate_support()
    samples = d.sample(jax.random.key(15), (4000,))
    probs = np.exp(np.asarray(jax.vmap(d.log_prob)(support)))
    freqs = np.array(
        [
            np.mean((np.asarray(samples) == np.asarray(v)).all(-1))
            for v in support
        ]
    )
    assert np.allclose(freqs, probs, atol=0.05)
