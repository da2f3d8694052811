"""Gamma-Gaussian algebra + GammaGaussianHMM tests (mirrors
``tests/ops/test_gamma_gaussian.py`` and ``tests/distributions/test_hmm.py``
GammaGaussianHMM cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.distributions.multivariate import MultivariateNormal
from pyro_tpu.ops.gamma_gaussian import (
    Gamma,
    GammaGaussian,
    gamma_and_mvn_to_gamma_gaussian,
    gamma_gaussian_tensordot,
    matrix_and_mvn_to_gamma_gaussian,
)


def random_mvn(key, batch_shape, dim):
    k1, k2 = jax.random.split(key)
    loc = jax.random.normal(k1, batch_shape + (dim,))
    A = jax.random.normal(k2, batch_shape + (dim, dim)) * 0.5
    cov = A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(dim)
    return MultivariateNormal(loc, covariance_matrix=cov)


def test_gamma_and_mvn_roundtrip_density():
    """Joint density == Gamma.log_prob(s) + scaled-MVN.log_prob(x)."""
    key = jax.random.key(0)
    mvn = random_mvn(key, (), 3)
    gamma = dist.Gamma(2.5, 3.0)
    gg = gamma_and_mvn_to_gamma_gaussian(gamma, mvn)
    for s in [0.5, 1.0, 2.3]:
        s = jnp.asarray(s)
        x = jax.random.normal(jax.random.key(int(s * 10)), (3,))
        scaled = MultivariateNormal(
            mvn.loc, scale_tril=mvn.scale_tril / jnp.sqrt(s)
        )
        expected = gamma.log_prob(s) + scaled.log_prob(x)
        actual = gg.log_density(x, s)
        assert np.allclose(float(actual), float(expected), atol=1e-4), (
            float(actual),
            float(expected),
        )


def test_matrix_and_mvn_density():
    """Conditional density p(y | x, s) for the noisy affine map."""
    key = jax.random.key(1)
    x_dim, y_dim = 2, 3
    matrix = jax.random.normal(jax.random.key(2), (x_dim, y_dim))
    mvn = random_mvn(key, (), y_dim)
    gg = matrix_and_mvn_to_gamma_gaussian(matrix, mvn)
    x = jax.random.normal(jax.random.key(3), (x_dim,))
    y = jax.random.normal(jax.random.key(4), (y_dim,))
    for s in [0.7, 1.0, 1.8]:
        s = jnp.asarray(s)
        scaled = MultivariateNormal(
            x @ matrix + mvn.loc, scale_tril=mvn.scale_tril / jnp.sqrt(s)
        )
        expected = scaled.log_prob(y)
        actual = gg.log_density(jnp.concatenate([x, y]), s)
        assert np.allclose(float(actual), float(expected), atol=1e-4)


def test_compound_is_student_t():
    """Integrating out s from Gamma(df/2,df/2) x scaled-MVN gives
    MultivariateStudentT(df)."""
    df = 5.0
    key = jax.random.key(5)
    mvn = random_mvn(key, (), 3)
    gamma = dist.Gamma(df / 2, df / 2)
    gg = gamma_and_mvn_to_gamma_gaussian(gamma, mvn)
    stu = gg.compound()
    expected = dist.MultivariateStudentT(df, mvn.loc, mvn.scale_tril)
    x = jax.random.normal(jax.random.key(6), (4, 3))
    # compound() drops the log_normalizer of the joint; both are normalized
    # densities so they must agree exactly.
    assert np.allclose(
        np.asarray(stu.log_prob(x)),
        np.asarray(expected.log_prob(x)),
        atol=1e-4,
    )


def test_marginalize_consistency():
    """marginalize + event_logsumexp == full event_logsumexp."""
    key = jax.random.key(7)
    mvn = random_mvn(key, (), 4)
    gamma = dist.Gamma(3.0, 2.0)
    gg = gamma_and_mvn_to_gamma_gaussian(gamma, mvn)
    full = gg.event_logsumexp()
    left = gg.marginalize(left=2).event_logsumexp()
    right = gg.marginalize(right=2).event_logsumexp()
    for a, b in [(full, left), (full, right)]:
        for s in [0.5, 1.5]:
            s = jnp.asarray(s)
            assert np.allclose(
                float(a.log_density(s)), float(b.log_density(s)), atol=1e-4
            )


def test_condition_consistency():
    key = jax.random.key(8)
    mvn = random_mvn(key, (), 4)
    gamma = dist.Gamma(3.0, 2.0)
    gg = gamma_and_mvn_to_gamma_gaussian(gamma, mvn)
    x = jax.random.normal(jax.random.key(9), (4,))
    for s in [0.5, 1.7]:
        s = jnp.asarray(s)
        expected = gg.log_density(x, s)
        actual = gg.condition(x[2:]).log_density(x[:2], s)
        assert np.allclose(float(actual), float(expected), atol=1e-4)


def test_tensordot_matches_quadrature():
    """gamma_gaussian_tensordot integrates the shared block exactly."""
    k1, k2 = jax.random.split(jax.random.key(10))
    x = gamma_and_mvn_to_gamma_gaussian(
        dist.Gamma(2.0, 2.0), random_mvn(k1, (), 3)
    )
    y = matrix_and_mvn_to_gamma_gaussian(
        jax.random.normal(jax.random.key(11), (2, 2)),
        random_mvn(k2, (), 2),
    )
    # x over (a, b) with a=1, b=2; y over (b, c) with c=2
    joint = gamma_gaussian_tensordot(x, y, dims=2)
    assert joint.dim == 3
    # check against dense quadrature over the contracted block b
    a = jax.random.normal(jax.random.key(12), (1,))
    c = jax.random.normal(jax.random.key(13), (2,))
    s = jnp.asarray(1.3)
    grid = jnp.linspace(-8, 8, 201)
    db = (grid[1] - grid[0]) ** 2
    B1, B2 = jnp.meshgrid(grid, grid, indexing="ij")
    bs = jnp.stack([B1.ravel(), B2.ravel()], -1)
    vals = x.log_density(
        jnp.concatenate([jnp.broadcast_to(a, bs.shape[:-1] + (1,)), bs], -1),
        s,
    ) + y.log_density(
        jnp.concatenate([bs, jnp.broadcast_to(c, bs.shape[:-1] + (2,))], -1),
        s,
    )
    expected = jax.scipy.special.logsumexp(vals) + jnp.log(db)
    actual = joint.log_density(jnp.concatenate([a, c]), s)
    assert np.allclose(float(actual), float(expected), atol=1e-2)


@pytest.mark.parametrize("num_steps", [1, 2, 3, 5])
def test_gamma_gaussian_hmm_log_prob_vs_quadrature(num_steps):
    """log_prob == numerical integral over the Gamma mixing variable of
    the scaled GaussianHMM likelihood."""
    hidden_dim, obs_dim = 2, 1
    df = 6.0
    k = jax.random.split(jax.random.key(14), 6)
    init = random_mvn(k[0], (), hidden_dim)
    A = 0.5 * jax.random.normal(k[1], (hidden_dim, hidden_dim))
    trans = random_mvn(k[2], (), hidden_dim)
    C = jax.random.normal(k[3], (hidden_dim, obs_dim))
    obs = random_mvn(k[4], (), obs_dim)
    scale_dist = dist.Gamma(df / 2, df / 2)

    hmm = dist.GammaGaussianHMM(
        scale_dist, init, A, trans, C, obs, duration=num_steps
    )
    value = jax.random.normal(k[5], (num_steps, obs_dim))
    actual = hmm.log_prob(value)

    # quadrature: for each s, the conditional is a GaussianHMM with all
    # noise scale_trils divided by sqrt(s)
    ss = jnp.linspace(1e-3, 12.0, 4001)
    ds = ss[1] - ss[0]

    def cond_logp(s):
        sqrt_s = jnp.sqrt(s)
        ghmm = dist.GaussianHMM(
            MultivariateNormal(init.loc, scale_tril=init.scale_tril / sqrt_s),
            A,
            MultivariateNormal(
                trans.loc, scale_tril=trans.scale_tril / sqrt_s
            ),
            C,
            MultivariateNormal(obs.loc, scale_tril=obs.scale_tril / sqrt_s),
            duration=num_steps,
        )
        return ghmm.log_prob(value) + scale_dist.log_prob(s)

    logps = jax.vmap(cond_logp)(ss)
    expected = jax.scipy.special.logsumexp(logps) + jnp.log(ds)
    assert np.allclose(float(actual), float(expected), atol=1e-2), (
        float(actual),
        float(expected),
    )


def test_gamma_gaussian_hmm_filter():
    """filter returns a (Gamma, MVN) posterior; the Gamma concentration
    grows by (T*obs_dim + hidden_dim)/2 over the prior."""
    hidden_dim, obs_dim, T = 2, 2, 6
    df = 4.0
    k = jax.random.split(jax.random.key(20), 6)
    init = random_mvn(k[0], (), hidden_dim)
    A = 0.5 * jax.random.normal(k[1], (hidden_dim, hidden_dim))
    trans = random_mvn(k[2], (), hidden_dim)
    C = jax.random.normal(k[3], (hidden_dim, obs_dim))
    obs = random_mvn(k[4], (), obs_dim)
    hmm = dist.GammaGaussianHMM(
        dist.Gamma(df / 2, df / 2), init, A, trans, C, obs, duration=T
    )
    value = jax.random.normal(k[5], (T, obs_dim))
    scale_post, mvn_post = hmm.filter(value)
    assert isinstance(scale_post, dist.Gamma)
    assert mvn_post.event_shape == (hidden_dim,)
    # conjugate update: conc increases by half the number of Gaussian dims
    # integrated or observed (T*obs_dim observations + T*hidden transitions
    # marginalized cancel, leaving T*obs_dim/2)
    assert float(scale_post.concentration) > df / 2
    assert np.allclose(
        float(scale_post.concentration), df / 2 + T * obs_dim / 2, atol=1e-4
    )


def test_gamma_gaussian_hmm_batched_and_jit():
    hidden_dim, obs_dim, T, B = 2, 1, 4, 3
    df = 5.0
    k = jax.random.split(jax.random.key(30), 6)
    init = random_mvn(k[0], (), hidden_dim)
    A = 0.5 * jax.random.normal(k[1], (B, 1, hidden_dim, hidden_dim))
    trans = random_mvn(k[2], (), hidden_dim)
    C = jax.random.normal(k[3], (hidden_dim, obs_dim))
    obs = random_mvn(k[4], (), obs_dim)
    hmm = dist.GammaGaussianHMM(
        dist.Gamma(df / 2, df / 2), init, A, trans, C, obs, duration=T
    )
    assert hmm.batch_shape == (B,)
    value = jax.random.normal(k[5], (B, T, obs_dim))
    lp = jax.jit(hmm.log_prob)(value)
    assert lp.shape == (B,)
    assert np.isfinite(np.asarray(lp)).all()


def test_homogeneous_gamma_chain_matches_general():
    """Shared-precision Student-T HMM fast path == general contraction."""
    import pyro_tpu.distributions as dist
    from pyro_tpu.ops.gamma_gaussian import (
        gamma_gaussian_tensordot,
        sequential_gamma_gaussian_tensordot,
    )

    H, O = 3, 2
    k = jax.random.split(jax.random.key(1), 3)
    init = dist.MultivariateNormal(jnp.zeros(H), jnp.eye(H))
    tm = 0.8 * jnp.eye(H) + 0.1 * jax.random.normal(k[0], (H, H))
    trans = dist.MultivariateNormal(jnp.zeros(H), 0.5 * jnp.eye(H))
    om = jax.random.normal(k[1], (H, O))
    obs = dist.MultivariateNormal(jnp.zeros(O), 0.7 * jnp.eye(O))
    for T in [1, 3, 8, 13, 50]:
        hmm = dist.GammaGaussianHMM(
            dist.Gamma(2.0, 2.0), init, tm, trans, om, obs, duration=T
        )
        data = jax.random.normal(k[2], (T, O))
        lp_fast = float(hmm.log_prob(data))
        r = hmm._trans + hmm._obs.condition(data).event_pad(left=H)
        assert r.precision.ndim == 2  # fast path active
        r = r.expand(r.batch_shape)
        r = sequential_gamma_gaussian_tensordot(r)
        r = gamma_gaussian_tensordot(hmm._init, r, dims=H)
        lp_ref = float(r.event_logsumexp().logsumexp())
        assert abs(lp_fast - lp_ref) < 1e-3 * max(1.0, abs(lp_ref)), (
            T,
            lp_fast,
            lp_ref,
        )


def test_compound_precision_scales_with_dtype():
    """Under PYRO_TPU_X64=1 the Student-T compounding identity must hold
    to ~1e-10; in f32 only ~1e-4 is reachable."""
    import os

    x64 = os.environ.get("PYRO_TPU_X64") == "1"
    atol = 1e-10 if x64 else 1e-4
    df = 7.0
    mvn = random_mvn(jax.random.key(21), (), 3)
    gg = gamma_and_mvn_to_gamma_gaussian(dist.Gamma(df / 2, df / 2), mvn)
    stu = gg.compound()
    expected = dist.MultivariateStudentT(df, mvn.loc, mvn.scale_tril)
    x = jax.random.normal(jax.random.key(22), (4, 3))
    np.testing.assert_allclose(
        np.asarray(stu.log_prob(x)), np.asarray(expected.log_prob(x)), atol=atol
    )
