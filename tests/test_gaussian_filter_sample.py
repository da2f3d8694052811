"""Exact tests for the O(log T) parallel-scan Gaussian filter-sampler.

The tree FFBS (ref ``ops/gaussian.py:600``) is a *reparameterized*
sampler: with ``noise`` given, the output is an affine function of the
white noise.  That makes correctness checkable exactly, no statistics:

* ``noise = 0``  must return the analytic posterior mean of the chain
  (conditional means of Gaussians compose linearly to the joint mean);
* the Jacobian wrt ``noise`` is a square root of the posterior
  covariance: ``J @ J.T`` must equal the analytic covariance.

Both are compared against a dense block-tridiagonal construction of the
full (T+1)*n joint, for heterogeneous (time-varying) transitions.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pyro_tpu.ops.gaussian import (
    Gaussian,
    sequential_gaussian_filter_sample,
    sequential_gaussian_filter_sample_sequential,
)


def _rand_gaussian(key, batch, dim):
    k1, k2, k3 = jax.random.split(key, 3)
    m = jax.random.normal(k1, batch + (dim, dim))
    precision = m @ jnp.swapaxes(m, -1, -2) + dim * jnp.eye(dim)
    info_vec = jax.random.normal(k2, batch + (dim,))
    log_normalizer = jax.random.normal(k3, batch)
    return Gaussian(log_normalizer, info_vec, precision)


def _dense_chain_moments(init, trans):
    """Posterior mean/cov of the full chain via one dense solve."""
    n = init.dim
    T = trans.batch_shape[-1]
    N = (T + 1) * n
    P = np.zeros((N, N))
    i = np.zeros(N)
    P[:n, :n] += np.asarray(init.precision)
    i[:n] += np.asarray(init.info_vec)
    for t in range(T):
        sl = slice(t * n, (t + 2) * n)
        P[sl, sl] += np.asarray(trans.precision[t])
        i[sl] += np.asarray(trans.info_vec[t])
    cov = np.linalg.inv(P)
    mean = cov @ i
    return mean.reshape(T + 1, n), cov


@pytest.mark.parametrize("T", [1, 2, 3, 4, 5, 7, 8, 11, 16])
@pytest.mark.parametrize("n", [1, 3])
def test_tree_sampler_exact_mean(T, n):
    init = _rand_gaussian(jax.random.key(0), (), n)
    trans = _rand_gaussian(jax.random.key(T * 10 + n), (T,), 2 * n)
    mean, _ = _dense_chain_moments(init, trans)
    z = sequential_gaussian_filter_sample(
        init, trans, noise=jnp.zeros((T + 1, n))
    )
    assert z.shape == (T + 1, n)
    np.testing.assert_allclose(np.asarray(z), mean, atol=1e-4, rtol=1e-4)


@pytest.mark.parametrize("T", [1, 3, 5, 8])
def test_tree_sampler_exact_covariance(T):
    n = 2
    init = _rand_gaussian(jax.random.key(1), (), n)
    trans = _rand_gaussian(jax.random.key(100 + T), (T,), 2 * n)
    _, cov = _dense_chain_moments(init, trans)

    def draw(eps):
        return sequential_gaussian_filter_sample(
            init, trans, noise=eps.reshape(T + 1, n)
        ).reshape(-1)

    J = jax.jacfwd(draw)(jnp.zeros((T + 1) * n))
    np.testing.assert_allclose(
        np.asarray(J @ J.T), cov, atol=1e-4, rtol=1e-4
    )


@pytest.mark.parametrize("T", [1, 3, 6])
def test_sequential_sampler_exact_mean_and_cov(T):
    """The retained O(T) scan path must agree with the same analytics."""
    n = 2
    init = _rand_gaussian(jax.random.key(2), (), n)
    trans = _rand_gaussian(jax.random.key(200 + T), (T,), 2 * n)
    mean, cov = _dense_chain_moments(init, trans)
    N = 50_000
    z = sequential_gaussian_filter_sample_sequential(
        init, trans, (N,), rng_key=jax.random.key(0)
    )
    z = np.asarray(z).reshape(N, -1)
    np.testing.assert_allclose(z.mean(0).reshape(T + 1, n), mean, atol=0.05)
    emp_cov = np.cov(z.T)
    np.testing.assert_allclose(emp_cov, cov, atol=0.05)


def test_tree_sampler_batched_shapes_and_key_draws():
    n, T = 2, 6
    batch = (3,)
    init = _rand_gaussian(jax.random.key(3), (), n)
    trans = _rand_gaussian(jax.random.key(4), batch + (T,), 2 * n)
    z = sequential_gaussian_filter_sample(
        init, trans, (5,), rng_key=jax.random.key(0)
    )
    assert z.shape == (5,) + batch + (T + 1, n)
    z2 = sequential_gaussian_filter_sample(
        init, trans, (5,), rng_key=jax.random.key(1)
    )
    assert not np.allclose(np.asarray(z), np.asarray(z2))
    # batched exact mean against per-batch dense solves
    zm = sequential_gaussian_filter_sample(
        init, trans, noise=jnp.zeros(batch + (T + 1, n))
    )
    for b in range(batch[0]):
        mean, _ = _dense_chain_moments(init, trans[b])
        np.testing.assert_allclose(
            np.asarray(zm[b]), mean, atol=1e-4, rtol=1e-4
        )


def test_tree_sampler_is_jittable_and_log_depth():
    """The traced program must grow O(log T), not O(T): quadrupling T
    adds two halving levels (a constant number of cholesky sites), so
    the cholesky count in the jaxpr must grow by a small constant."""

    def count_chol(T):
        n = 2
        init = _rand_gaussian(jax.random.key(5), (), n)
        trans = _rand_gaussian(jax.random.key(6), (T,), 2 * n)
        jaxpr = jax.make_jaxpr(
            lambda key: sequential_gaussian_filter_sample(
                init, trans, rng_key=key
            )
        )(jax.random.key(0))
        return str(jaxpr).count("cholesky")

    c64, c256 = count_chol(64), count_chol(256)
    assert c64 <= 60, f"T=64 cholesky sites {c64} - not log depth"
    assert c256 - c64 <= 16, (
        f"cholesky sites grew {c64}->{c256} from T=64 to T=256: O(T)?"
    )
    # and the whole thing jits
    n, T = 2, 64
    init = _rand_gaussian(jax.random.key(5), (), n)
    trans = _rand_gaussian(jax.random.key(6), (T,), 2 * n)
    z = jax.jit(
        lambda key: sequential_gaussian_filter_sample(
            init, trans, rng_key=key
        )
    )(jax.random.key(0))
    assert z.shape == (T + 1, n)
