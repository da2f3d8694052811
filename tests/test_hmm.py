"""HMM distribution tests: O(log T) marginalization vs brute force
(mirrors ``tests/distributions/test_hmm.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.ops.gaussian import (
    Gaussian,
    gaussian_tensordot,
    mvn_to_gaussian,
    matrix_and_mvn_to_gaussian,
    sequential_gaussian_tensordot,
)

KEY = jax.random.key(0)


def brute_force_discrete_hmm_logprob(init_logits, trans_logits, obs_lp):
    """O(T*S^2) forward algorithm in numpy."""
    init = np.asarray(init_logits)
    trans = np.asarray(trans_logits)
    obs = np.asarray(obs_lp)  # (T, S)
    T, S = obs.shape
    from scipy.special import logsumexp
    alpha = init  # over pre-obs state
    for t in range(T):
        tl = trans[t] if trans.ndim == 3 else trans
        alpha = logsumexp(alpha[:, None] + tl + obs[t][None, :], axis=0)
    return logsumexp(alpha)


@pytest.mark.parametrize("T", [1, 2, 3, 5, 8, 16, 17])
def test_discrete_hmm_matches_brute_force(T):
    S = 3
    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    init = jax.random.normal(k1, (S,))
    trans = jax.random.normal(k2, (T, S, S))
    obs_loc = jax.random.normal(k3, (T, S))
    obs_dist = dist.Normal(obs_loc, 1.0)
    d = dist.DiscreteHMM(init, trans, obs_dist)
    assert d.event_shape == (T,)
    value = jax.random.normal(k4, (T,))
    actual = float(d.log_prob(value))
    obs_lp = np.asarray(
        dist.Normal(obs_loc, 1.0).log_prob(value[:, None])
    )
    init_n = np.asarray(init - jax.scipy.special.logsumexp(init))
    trans_n = np.asarray(
        trans - jax.scipy.special.logsumexp(trans, axis=-1, keepdims=True)
    )
    expected = brute_force_discrete_hmm_logprob(init_n, trans_n, obs_lp)
    assert np.allclose(actual, expected, rtol=1e-4), (actual, expected)


def test_discrete_hmm_homogeneous_broadcast():
    S = 4
    init = jnp.zeros(S)
    trans = jax.random.normal(KEY, (S, S))
    obs_dist = dist.Normal(jnp.arange(float(S)), 1.0).expand((1, S))
    d = dist.DiscreteHMM(init, trans[None], obs_dist, duration=10)
    value = jax.random.normal(KEY, (10,))
    assert np.isfinite(float(d.log_prob(value)))
    x = d.sample(KEY)
    assert x.shape == (10,)


def test_discrete_hmm_filter():
    S, T = 3, 6
    k1, k2 = jax.random.split(KEY)
    init = jax.random.normal(k1, (S,))
    trans = jax.random.normal(k2, (T, S, S))
    obs_dist = dist.Normal(jnp.arange(float(S)) * 2, 0.5).expand((T, S))
    d = dist.DiscreteHMM(init, trans, obs_dist)
    value = jnp.full((T,), 4.0)  # near state 2
    post = d.filter(value)
    probs = np.asarray(post.probs)
    assert probs.shape == (S,)
    assert probs.argmax() == 2


def test_gaussian_algebra_tensordot():
    """(x ⨂ y) density equals brute-force integral on a grid-free identity:
    contracting a joint Gaussian against marginalization."""
    k1, k2 = jax.random.split(KEY)
    # random PD precisions
    A1 = jax.random.normal(k1, (3, 3))
    P1 = A1 @ A1.T + 3 * jnp.eye(3)
    A2 = jax.random.normal(k2, (3, 3))
    P2 = A2 @ A2.T + 3 * jnp.eye(3)
    g1 = Gaussian(jnp.asarray(0.5), jax.random.normal(k1, (3,)), P1)
    g2 = Gaussian(jnp.asarray(-0.2), jax.random.normal(k2, (3,)), P2)
    # contract 1 dim: result over (2 + 2) dims
    out = gaussian_tensordot(g1, g2, dims=1)
    assert out.dim == 4
    # total mass identity: logsumexp(out) == logsumexp(joint)
    joint = g1.event_pad(right=2) + g2.event_pad(left=2)
    assert np.allclose(
        float(out.event_logsumexp()),
        float(joint.event_logsumexp()),
        rtol=1e-5,
    )


def test_gaussian_hmm_logprob_matches_dense_mvn():
    """GaussianHMM log_prob == the log_prob of the equivalent joint MVN."""
    hidden, obs_d, T = 2, 2, 4
    ks = jax.random.split(KEY, 6)
    init = dist.MultivariateNormal(
        jnp.zeros(hidden), covariance_matrix=jnp.eye(hidden)
    )
    trans_mat = 0.5 * jnp.eye(hidden) + 0.1 * jax.random.normal(ks[0], (hidden, hidden))
    trans_dist = dist.MultivariateNormal(
        jnp.zeros(hidden), covariance_matrix=0.5 * jnp.eye(hidden)
    )
    obs_mat = jax.random.normal(ks[1], (hidden, obs_d))
    obs_dist = dist.MultivariateNormal(
        jnp.zeros(obs_d), covariance_matrix=0.3 * jnp.eye(obs_d)
    )
    d = dist.GaussianHMM(
        init, trans_mat[None], trans_dist.expand((1,)), obs_mat[None],
        obs_dist.expand((1,)), duration=T,
    )
    value = jax.random.normal(ks[2], (T, obs_d))
    actual = float(d.log_prob(value))

    # dense construction in numpy: z ~ AR(1), y = z H + noise
    A = np.asarray(trans_mat)
    H = np.asarray(obs_mat)
    Q = 0.5 * np.eye(hidden)
    R = 0.3 * np.eye(obs_d)
    P0 = np.eye(hidden)
    # joint covariance of z_{1:T} (after one transition from z_0)
    # z_t = A' z_{t-1} + w (note x @ A convention => z' = A^T z)
    At = A.T
    covs = {}
    P = At @ P0 @ At.T + Q
    zcov = np.zeros((T * hidden, T * hidden))
    Ps = []
    for t in range(T):
        Ps.append(P)
        P = At @ P @ At.T + Q
    for i in range(T):
        for j in range(i, T):
            # cov(z_i, z_j) = P_i (At^T)^{j-i}
            C = Ps[i] @ np.linalg.matrix_power(At.T, j - i)
            zcov[i*hidden:(i+1)*hidden, j*hidden:(j+1)*hidden] = C
            zcov[j*hidden:(j+1)*hidden, i*hidden:(i+1)*hidden] = C.T
    Hbig = np.kron(np.eye(T), H.T)  # y = H^T z
    ycov = Hbig @ zcov @ Hbig.T + np.kron(np.eye(T), R)
    from scipy.stats import multivariate_normal
    expected = multivariate_normal.logpdf(
        np.asarray(value).reshape(-1), np.zeros(T * obs_d), ycov
    )
    assert np.allclose(actual, expected, rtol=1e-4), (actual, expected)


def test_gaussian_hmm_rsample_moments():
    hidden, obs_d, T = 2, 1, 5
    init = dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=jnp.eye(hidden))
    trans_mat = 0.8 * jnp.eye(hidden)
    trans_dist = dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=0.2 * jnp.eye(hidden))
    obs_mat = jnp.ones((hidden, obs_d))
    obs_dist = dist.MultivariateNormal(jnp.zeros(obs_d), covariance_matrix=0.1 * jnp.eye(obs_d))
    d = dist.GaussianHMM(
        init, trans_mat[None], trans_dist.expand((1,)), obs_mat[None],
        obs_dist.expand((1,)), duration=T,
    )
    x = d.rsample(KEY, (8000,))
    assert x.shape == (8000, T, obs_d)
    # mean should be ~0, marginal variance via analytic recursion
    assert np.abs(np.asarray(x).mean()) < 0.05
    # cross-check marginal variances against log_prob consistency:
    lp = d.log_prob(x[:100])
    assert np.isfinite(np.asarray(lp)).all()


def test_gaussian_hmm_filter_runs():
    hidden, obs_d, T = 2, 2, 6
    init = dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=jnp.eye(hidden))
    d = dist.GaussianHMM(
        init,
        jnp.eye(hidden)[None],
        dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=jnp.eye(hidden)).expand((1,)),
        jnp.eye(hidden)[None],
        dist.MultivariateNormal(jnp.zeros(obs_d), covariance_matrix=jnp.eye(obs_d)).expand((1,)),
        duration=T,
    )
    value = jax.random.normal(KEY, (T, obs_d))
    post = d.filter(value)
    assert post.batch_shape == ()
    assert post.event_shape == (hidden,)


def test_independent_hmm():
    hidden, T, C = 2, 5, 3
    init = dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=jnp.eye(hidden))
    base = dist.GaussianHMM(
        init.expand((C,)),
        0.5 * jnp.eye(hidden),
        dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=0.3 * jnp.eye(hidden)).expand((C, 1)),
        jnp.ones((hidden, 1)),
        dist.MultivariateNormal(jnp.zeros(1), covariance_matrix=0.2 * jnp.eye(1)).expand((C, 1)),
        duration=T,
    )
    d = dist.IndependentHMM(base)
    assert d.event_shape == (T, C)
    x = d.rsample(KEY)
    assert x.shape == (T, C)
    lp = d.log_prob(x)
    assert lp.shape == ()
    # equals sum of per-channel log probs
    per = base.log_prob(jnp.moveaxis(x, -1, 0)[..., None])
    assert np.allclose(float(lp), float(per.sum()), rtol=1e-4)


def test_linear_hmm_reparam_to_gaussian():
    """LinearHMM with Gaussian parts reparams to an equivalent GaussianHMM."""
    from pyro_tpu.infer.reparam import LinearHMMReparam
    import pyro_tpu as pyro
    from pyro_tpu import poutine

    hidden, obs_d, T = 2, 1, 4
    init = dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=jnp.eye(hidden))
    tm = 0.7 * jnp.eye(hidden)
    tn = dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=0.4 * jnp.eye(hidden)).expand((1,))
    om = jnp.ones((hidden, obs_d))
    on = dist.MultivariateNormal(jnp.zeros(obs_d), covariance_matrix=0.2 * jnp.eye(obs_d)).expand((1,))
    lhmm = dist.LinearHMM(init, tm[None], tn, om[None], on, duration=T)
    data = jax.random.normal(KEY, (T, obs_d))

    def model():
        pyro.sample("x", lhmm, obs=data)

    r = poutine.reparam(model, config={"x": LinearHMMReparam()})
    tr = poutine.trace(poutine.seed(r, 0)).get_trace()
    tr.compute_log_prob()
    actual = float(tr.nodes["x"]["log_prob_sum"])
    ghmm = dist.GaussianHMM(init, tm[None], tn, om[None], on, duration=T)
    assert np.allclose(actual, float(ghmm.log_prob(data)), rtol=1e-4)


def test_linear_hmm_studentt_reparam_trains():
    """StudentT-noise LinearHMM becomes tractable via StudentTReparam."""
    from pyro_tpu.infer.reparam import LinearHMMReparam, StudentTReparam
    import pyro_tpu as pyro
    from pyro_tpu import poutine

    hidden, obs_d, T = 1, 1, 6
    init = dist.Normal(jnp.zeros(hidden), 1.0).to_event(1)
    tn = dist.Normal(jnp.zeros((1, hidden)), 0.5).to_event(1)
    on = dist.StudentT(4.0, jnp.zeros((1, obs_d)), 0.3).to_event(1)
    lhmm = dist.LinearHMM(
        init, 0.8 * jnp.eye(hidden)[None], tn,
        jnp.ones((hidden, obs_d))[None], on, duration=T,
    )
    data = jax.random.normal(KEY, (T, obs_d))

    def model():
        pyro.sample("x", lhmm, obs=data)

    r = poutine.reparam(
        model, config={"x": LinearHMMReparam(obs=StudentTReparam())}
    )
    tr = poutine.trace(poutine.seed(r, 0)).get_trace()
    tr.compute_log_prob()
    assert "x_obs_gamma" in tr
    assert np.isfinite(float(tr.log_prob_sum()))


def test_gaussian_mrf_logprob_finite():
    hidden, obs_d, T = 2, 1, 4
    init = dist.MultivariateNormal(jnp.zeros(hidden), covariance_matrix=jnp.eye(hidden))
    trans = dist.MultivariateNormal(
        jnp.zeros(2 * hidden), covariance_matrix=jnp.eye(2 * hidden)
    ).expand((1,))
    obs = dist.MultivariateNormal(
        jnp.zeros(hidden + obs_d), covariance_matrix=jnp.eye(hidden + obs_d)
    ).expand((1,))
    d = dist.GaussianMRF(init, trans, obs, duration=T)
    value = jax.random.normal(KEY, (T, obs_d))
    assert np.isfinite(float(d.log_prob(value)))


def test_homogeneous_chain_reduce_matches_general():
    """The shared-precision fast path must agree with the general
    pairwise contraction for every T shape class (1, odd, even, pow2,
    mixed-binary) and batched values."""
    import pyro_tpu.distributions as dist
    from pyro_tpu.ops.gaussian import (
        gaussian_tensordot,
        sequential_gaussian_tensordot,
    )

    H, O = 3, 2
    k = jax.random.split(jax.random.key(7), 4)
    init = dist.Normal(jnp.zeros(H), 1.0).to_event(1)
    tm = 0.8 * jnp.eye(H) + 0.1 * jax.random.normal(k[0], (H, H))
    trans = dist.Normal(jnp.zeros(H), 0.5).to_event(1)
    om = jax.random.normal(k[1], (H, O))
    obs = dist.Normal(jnp.zeros(O), 0.7).to_event(1)
    for T in [1, 2, 3, 5, 8, 13, 64, 100]:
        hmm = dist.GaussianHMM(init, tm, trans, om, obs, duration=T)
        data = jax.random.normal(k[2], (T, O))
        lp_fast = float(hmm.log_prob(data))
        result = hmm._trans + hmm._obs.condition(data).event_pad(left=H)
        assert result.precision.ndim == 2  # fast path is active
        result = result.expand(result.batch_shape)
        r = sequential_gaussian_tensordot(result)
        r = gaussian_tensordot(hmm._init, r, dims=H)
        lp_ref = float(r.event_logsumexp())
        assert abs(lp_fast - lp_ref) < 1e-3 * max(1.0, abs(lp_ref)), (
            T,
            lp_fast,
            lp_ref,
        )
    # batched observations share the single precision
    hmm = dist.GaussianHMM(init, tm, trans, om, obs, duration=13)
    data = jax.random.normal(k[3], (4, 13, O))
    lp = hmm.log_prob(data)
    for i in range(4):
        assert abs(float(lp[i]) - float(hmm.log_prob(data[i]))) < 1e-3


def test_time_varying_params_use_general_path():
    """Time-varying transition matrices must NOT take the homogeneous
    shortcut (and must still be correct)."""
    import pyro_tpu.distributions as dist

    H, O, T = 2, 2, 6
    k = jax.random.split(jax.random.key(9), 4)
    init = dist.Normal(jnp.zeros(H), 1.0).to_event(1)
    tms = 0.8 * jnp.eye(H) + 0.1 * jax.random.normal(k[0], (T, H, H))
    trans = dist.Normal(jnp.zeros(H), 0.5).to_event(1)
    om = jax.random.normal(k[1], (H, O))
    obs = dist.Normal(jnp.zeros(O), 0.7).to_event(1)
    hmm = dist.GaussianHMM(init, tms, trans, om, obs, duration=T)
    data = jax.random.normal(k[2], (T, O))
    result = hmm._trans + hmm._obs.condition(data).event_pad(left=H)
    assert result.precision.ndim > 2  # general path
    lp = float(hmm.log_prob(data))
    assert np.isfinite(lp)


@pytest.mark.stage("integration")
def test_parallel_posterior_sampler_moments():
    """The O(log T) homogeneous filter-sampler's empirical posterior
    moments match the exact dense-joint Gaussian posterior."""
    import pyro_tpu.distributions as dist

    H, O, T = 2, 2, 6
    k = jax.random.split(jax.random.key(0), 4)
    init = dist.Normal(jnp.zeros(H), 1.0).to_event(1)
    tm = 0.7 * jnp.eye(H) + 0.15 * jax.random.normal(k[0], (H, H))
    trans = dist.Normal(jnp.zeros(H), 0.5).to_event(1)
    om = jax.random.normal(k[1], (H, O))
    obs = dist.Normal(jnp.zeros(O), 0.6).to_event(1)
    hmm = dist.GaussianHMM(init, tm, trans, om, obs, duration=T)
    data = jax.random.normal(k[2], (T, O))

    n, N = H, (T + 1) * H
    factors = hmm._trans + hmm._obs.condition(data).event_pad(left=n)
    P = np.zeros((N, N))
    iv = np.zeros(N)
    Pf = np.asarray(
        jnp.broadcast_to(factors.precision, (T, 2 * n, 2 * n))
    )
    inf = np.asarray(jnp.broadcast_to(factors.info_vec, (T, 2 * n)))
    for t in range(T):
        sl = slice(t * n, (t + 2) * n)
        P[sl, sl] += Pf[t]
        iv[t * n : (t + 2) * n] += inf[t]
    P[:n, :n] += np.asarray(hmm._init.precision)
    iv[:n] += np.asarray(hmm._init.info_vec)
    cov_exact = np.linalg.inv(P)
    mean_exact = cov_exact @ iv

    S = 100000
    z = np.asarray(hmm.rsample_posterior(data, jax.random.key(7), (S,)))
    mean_emp = z.reshape(S, -1).mean(0)
    cov_emp = np.cov(z.reshape(S, -1).T)
    assert np.abs(mean_emp - mean_exact[n:]).max() < 0.02
    assert np.abs(cov_emp - cov_exact[n:, n:]).max() < 0.02


def test_parallel_sampler_shapes_all_length_classes():
    import pyro_tpu.distributions as dist

    H, O = 2, 2
    k = jax.random.split(jax.random.key(5), 4)
    init = dist.Normal(jnp.zeros(H), 1.0).to_event(1)
    tm = 0.7 * jnp.eye(H)
    trans = dist.Normal(jnp.zeros(H), 0.5).to_event(1)
    om = jax.random.normal(k[1], (H, O))
    obs = dist.Normal(jnp.zeros(O), 0.6).to_event(1)
    for T in [1, 2, 3, 5, 7, 8, 13]:
        hmm = dist.GaussianHMM(init, tm, trans, om, obs, duration=T)
        d = jax.random.normal(k[3], (T, O))
        z = hmm.rsample_posterior(d, jax.random.key(1), (3,))
        assert z.shape == (3, T, H) and np.isfinite(np.asarray(z)).all()
        x = hmm.rsample(jax.random.key(2), (3,))
        assert x.shape == (3, T, O) and np.isfinite(np.asarray(x)).all()
