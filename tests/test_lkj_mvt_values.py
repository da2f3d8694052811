"""Value-level checks for LKJCholesky, MultivariateStudentT, and
OrderedLogistic (ports the reference's ``tests/distributions/test_lkj.py``,
``test_mvt.py``, ``test_ordered_logistic.py`` density identities).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist


@pytest.mark.parametrize("dim", [2, 3, 4])
def test_lkj_log_prob_conc1_uniform(dim):
    """At concentration 1 the LKJ density over correlation MATRICES is
    uniform: log_prob minus the Cholesky->matrix Jacobian is constant
    (ref test_lkj.py:95)."""
    d = dist.LKJCholesky(dim, jnp.asarray(1.0))
    samples = d.sample(jax.random.key(0), (100,))
    lp = d.log_prob(samples)
    if dim == 2:
        np.testing.assert_allclose(
            np.asarray(lp), -math.log(2), atol=1e-5
        )
    else:
        diag = jnp.diagonal(samples, axis1=-2, axis2=-1)
        ladj = jnp.sum(
            jnp.log(diag) * jnp.linspace(dim - 1, 0, dim), axis=-1
        )
        flat = np.asarray(lp - ladj)
        assert np.abs(flat - flat.min()).sum() < 1e-3


@pytest.mark.parametrize("concentration", [0.5, 1.0, 2.0, 5.0])
def test_lkj_log_prob_d2_beta_identity(concentration):
    """For dim 2 the off-diagonal element is affine-Beta distributed
    (ref test_lkj.py:123)."""
    d = dist.LKJCholesky(2, jnp.asarray(concentration))
    test_dist = dist.TransformedDistribution(
        dist.Beta(concentration, concentration),
        dist.transforms.AffineTransform(loc=-1.0, scale=2.0),
    )
    samples = d.sample(jax.random.key(1), (100,))
    lp = np.asarray(d.log_prob(samples))
    x = samples[..., 1, 0]
    expected = np.asarray(test_dist.log_prob(x))
    finite = np.isfinite(expected)
    np.testing.assert_allclose(lp[finite], expected[finite], atol=1e-3)


@pytest.mark.parametrize("dim", [1, 2, 3])
def test_mvt_log_prob_scale_mixture_identity(dim):
    """MVT(df) equals the Gamma scale mixture of MVNs
    (ref test_mvt.py:83)."""
    k = jax.random.split(jax.random.key(2), 4)
    loc = jax.random.normal(k[0], (dim,))
    A = jax.random.normal(k[1], (dim, 2 * dim))
    scale_tril = jnp.linalg.cholesky(A @ A.T)
    x = jax.random.normal(k[2], (dim,))
    df = 4.7
    actual = float(
        dist.MultivariateStudentT(df, loc, scale_tril).log_prob(x)
    )
    n = 200000
    m = dist.Gamma(df / 2, df / 2).sample(k[3], (n,))
    mvn_scale = scale_tril / jnp.sqrt(m)[:, None, None]
    lps = dist.MultivariateNormal(loc, scale_tril=mvn_scale).log_prob(x)
    expected = float(
        jax.scipy.special.logsumexp(lps) - math.log(n)
    )
    np.testing.assert_allclose(actual, expected, atol=0.02)


def test_mvt_dim1_matches_student_t():
    loc = jnp.asarray([0.3])
    scale = jnp.asarray([[1.7]])
    x = jnp.asarray([0.9])
    df = 3.2
    actual = float(dist.MultivariateStudentT(df, loc, scale).log_prob(x))
    expected = float(dist.StudentT(df, loc[0], scale[0, 0]).log_prob(x[0]))
    np.testing.assert_allclose(actual, expected, rtol=1e-5)


@pytest.mark.parametrize("n_cutpoints", [2, 5])
def test_ordered_logistic_probs_sum_and_sample(n_cutpoints):
    """(ref test_ordered_logistic.py) class probs form a simplex and the
    sampler hits the right support."""
    predictor = jax.random.normal(jax.random.key(3), (4,))
    cutpoints = jnp.sort(jax.random.normal(jax.random.key(4), (n_cutpoints,)))
    d = dist.OrderedLogistic(predictor, cutpoints)
    probs = np.asarray(d.probs)
    assert probs.shape == (4, n_cutpoints + 1)
    np.testing.assert_allclose(probs.sum(-1), 1.0, rtol=1e-5)
    assert (probs > 0).all()
    s = d.sample(jax.random.key(5), (1000,))
    assert int(s.max()) <= n_cutpoints and int(s.min()) >= 0
    # log_prob consistent with probs
    val = jnp.asarray([0, 1, 2, 0])
    np.testing.assert_allclose(
        np.asarray(d.log_prob(val)),
        np.log(probs[np.arange(4), np.asarray(val)]),
        rtol=1e-5,
    )
