"""SpanningTree tests (mirrors ``tests/distributions/test_spanning_tree.py``):
C++ and Python backends agree; MCMC sampler matches enumerated posterior."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.distributions.spanning_tree import (
    find_best_tree,
    make_complete_graph,
    sample_tree_approx,
    sample_tree_mcmc,
    _load_cpp,
)

V = 4
K = V * (V - 1) // 2


def test_cpp_library_compiles():
    assert _load_cpp() is not None, "C++ spanning-tree extension failed to build"


def test_make_complete_graph_backends_agree():
    g_cpp = np.asarray(make_complete_graph(V, backend="cpp"))
    g_py = np.asarray(make_complete_graph(V, backend="python"))
    assert np.array_equal(g_cpp, g_py)
    assert g_cpp.shape == (2, K)


def test_find_best_tree_backends_agree():
    logits = jnp.asarray(np.random.RandomState(0).randn(K))
    t_cpp = np.asarray(find_best_tree(logits, backend="cpp"))
    t_py = np.asarray(find_best_tree(logits, backend="python"))
    assert np.array_equal(t_cpp, t_py)


def test_log_prob_normalized():
    """exp(log_prob) over enumerated support sums to 1."""
    logits = jnp.asarray(np.random.RandomState(1).randn(K))
    d = dist.SpanningTree(logits)
    support = d.enumerate_support()
    lps = jnp.stack([d.log_prob(t) for t in support])
    total = float(jnp.exp(jax.scipy.special.logsumexp(lps)))
    assert abs(total - 1.0) < 1e-4, total


@pytest.mark.parametrize("backend", ["cpp", "python"])
def test_mcmc_sampler_matches_posterior(backend):
    """Empirical tree frequencies match exact probabilities."""
    logits = jnp.asarray(0.8 * np.random.RandomState(2).randn(K))
    d = dist.SpanningTree(logits, sampler_options={"backend": backend, "mcmc_steps": 4})
    support = np.asarray(d.enumerate_support())
    probs = np.exp(
        np.asarray(jnp.stack([d.log_prob(jnp.asarray(t)) for t in support]))
    )
    counts = np.zeros(len(support))
    n = 400
    for i in range(n):
        t = np.asarray(d.sample(jax.random.key(i)))
        for j, s in enumerate(support):
            if np.array_equal(t, s):
                counts[j] += 1
                break
    freq = counts / n
    assert np.abs(freq - probs).max() < 0.08, (freq, probs)


def test_mode_is_map():
    logits = jnp.asarray(np.random.RandomState(3).randn(K))
    d = dist.SpanningTree(logits)
    support = d.enumerate_support()
    lps = np.asarray(jnp.stack([d.log_prob(t) for t in support]))
    best = np.asarray(support[lps.argmax()])
    assert np.array_equal(np.asarray(d.mode), best)
