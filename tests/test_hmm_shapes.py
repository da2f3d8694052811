"""HMM-family broadcast shape grids + conjugate/prefix identities.

Mirrors the reference's parameterized shape sweeps in
``tests/distributions/test_hmm.py`` (``test_discrete_hmm_shape:110-167``,
``test_gaussian_hmm_shape:300-397``, ``test_gamma_gaussian_hmm_shape``)
and the ``conjugate_update`` / ``prefix_condition`` semantics
(``pyro/distributions/hmm.py:638-740``) that round 5 added natively.
"""

from collections import namedtuple

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyro_tpu.distributions as dist
from pyro_tpu.distributions.util import broadcast_shape

KEYS = list(jax.random.split(jax.random.key(20250819), 16))


def random_mvn(batch_shape, dim, k):
    """A random full-covariance MVN with the given batch shape."""
    rank = dim + dim
    loc = jax.random.normal(KEYS[k], batch_shape + (dim,))
    cov = jax.random.normal(KEYS[k + 1], batch_shape + (dim, rank))
    cov = cov @ jnp.swapaxes(cov, -1, -2) / rank + jnp.eye(dim)
    return dist.MultivariateNormal(loc, covariance_matrix=cov)


# ---------------------------------------------------------------------------
# DiscreteHMM broadcast grid (ref test_discrete_hmm_shape)

DISCRETE_GRID = [
    # ok, init_shape, trans_shape, obs_shape
    (True, (), (), (1,)),
    (True, (), (1,), (1,)),
    (True, (), (), (7,)),
    (True, (), (7,), (7,)),
    (True, (), (1,), (7,)),
    (True, (), (7,), (11, 7)),
    (True, (), (11, 7), (7,)),
    (True, (), (11, 7), (11, 7)),
    (True, (11,), (7,), (7,)),
    (True, (11,), (7,), (11, 7)),
    (True, (11,), (11, 7), (7,)),
    (True, (11,), (11, 7), (11, 7)),
    (True, (4, 1, 1), (3, 1, 7), (2, 7)),
    (False, (), (1,), ()),
    (False, (), (7,), ()),
    (False, (), (7,), (1,)),
    (False, (), (7,), (6,)),
    (False, (3,), (4, 7), (7,)),
    (False, (3,), (7,), (4, 7)),
    (False, (), (3, 7), (4, 7)),
]


@pytest.mark.parametrize("state_dim", [2, 3])
@pytest.mark.parametrize("event_shape", [(), (5,)], ids=str)
@pytest.mark.parametrize("ok, init_shape, trans_shape, obs_shape", DISCRETE_GRID, ids=str)
def test_discrete_hmm_shape(ok, init_shape, trans_shape, obs_shape, event_shape, state_dim):
    init_logits = jax.random.normal(KEYS[0], init_shape + (state_dim,))
    trans_logits = jax.random.normal(
        KEYS[1], trans_shape + (state_dim, state_dim)
    )
    obs_logits = jax.random.normal(
        KEYS[2], obs_shape + (state_dim,) + event_shape
    )
    obs_dist = dist.Bernoulli(logits=obs_logits).to_event(len(event_shape))
    data = obs_dist.sample(KEYS[3])[
        (slice(None),) * len(obs_shape) + (0,)
    ]

    if not ok:
        with pytest.raises((ValueError, AssertionError, TypeError)):
            d = dist.DiscreteHMM(init_logits, trans_logits, obs_dist)
            np.asarray(d.log_prob(data))
        return

    d = dist.DiscreteHMM(init_logits, trans_logits, obs_dist)
    actual = d.log_prob(data)
    expected_shape = broadcast_shape(
        init_shape, trans_shape[:-1], obs_shape[:-1]
    )
    assert actual.shape == tuple(expected_shape)

    # expand broadcasts batch and keeps log_prob values
    expanded = d.expand((7,) + d.batch_shape)
    lp = expanded.log_prob(data)
    assert lp.shape == (7,) + tuple(expected_shape)
    np.testing.assert_allclose(
        np.asarray(lp[0]), np.asarray(actual), rtol=1e-5
    )

    final = d.filter(data)
    assert isinstance(final, dist.Categorical)
    assert final.batch_shape == d.batch_shape
    assert final.event_shape == ()


# ---------------------------------------------------------------------------
# GaussianHMM broadcast grid (ref test_gaussian_hmm_shape)

GAUSSIAN_GRID = [
    # init, trans_mat, trans_mvn, obs_mat, obs_mvn
    ((), (), (), (), ()),
    ((), (6,), (), (), ()),
    ((), (), (6,), (), ()),
    ((), (), (), (6,), ()),
    ((), (), (), (), (6,)),
    ((), (6,), (6,), (6,), (6,)),
    ((5,), (6,), (), (), ()),
    ((), (5, 1), (6,), (), ()),
    ((), (), (5, 1), (6,), ()),
    ((), (), (), (5, 1), (6,)),
    ((5,), (), (), (), (6,)),
    ((5,), (5, 6), (5, 6), (5, 6), (5, 6)),
]


@pytest.mark.parametrize("obs_dim", [1, 2])
@pytest.mark.parametrize("hidden_dim", [1, 3])
@pytest.mark.parametrize(
    "init_shape, trans_mat_shape, trans_mvn_shape, obs_mat_shape, obs_mvn_shape",
    GAUSSIAN_GRID,
    ids=str,
)
@pytest.mark.parametrize("diag", [False, True], ids=["full", "diag"])
def test_gaussian_hmm_shape(
    diag,
    init_shape,
    trans_mat_shape,
    trans_mvn_shape,
    obs_mat_shape,
    obs_mvn_shape,
    hidden_dim,
    obs_dim,
):
    init_dist = random_mvn(init_shape, hidden_dim, 0)
    trans_mat = jax.random.normal(
        KEYS[4], trans_mat_shape + (hidden_dim, hidden_dim)
    )
    trans_dist = random_mvn(trans_mvn_shape, hidden_dim, 2)
    obs_mat = jax.random.normal(
        KEYS[5], obs_mat_shape + (hidden_dim, obs_dim)
    )
    obs_dist = random_mvn(obs_mvn_shape, obs_dim, 4)
    if diag:
        scale = jnp.sqrt(
            jnp.diagonal(obs_dist.covariance_matrix, axis1=-2, axis2=-1)
        )
        obs_dist = dist.Normal(obs_dist.loc, scale).to_event(1)

    d = dist.GaussianHMM(
        init_dist, trans_mat, trans_dist, obs_mat, obs_dist, duration=6
    )

    shape = broadcast_shape(
        init_shape + (6,),
        trans_mat_shape,
        trans_mvn_shape,
        obs_mat_shape,
        obs_mvn_shape,
    )
    expected_batch_shape, time_shape = tuple(shape[:-1]), tuple(shape[-1:])
    expected_event_shape = time_shape + (obs_dim,)
    assert d.batch_shape == expected_batch_shape
    assert d.event_shape == expected_event_shape

    data = obs_dist.expand(tuple(shape)).sample(KEYS[6])
    assert data.shape == d.shape()
    actual = d.log_prob(data)
    assert actual.shape == expected_batch_shape

    x = d.rsample(KEYS[7])
    assert x.shape == d.shape()
    x = d.rsample(KEYS[7], (6,))
    assert x.shape == (6,) + d.shape()

    final = d.filter(data)
    assert isinstance(final, dist.MultivariateNormal)
    assert final.batch_shape == d.batch_shape
    assert final.event_shape == (hidden_dim,)

    z = d.rsample_posterior(data, KEYS[8])
    assert z.shape == expected_batch_shape + time_shape + (hidden_dim,)

    # conjugate_update keeps shapes
    likelihood = dist.Normal(data, 1.0).to_event(2)
    p, log_normalizer = d.conjugate_update(likelihood)
    assert p.batch_shape == d.batch_shape
    assert p.event_shape == d.event_shape
    assert jnp.shape(log_normalizer) == d.batch_shape
    x = p.rsample(KEYS[9])
    assert x.shape == d.shape()

    # prefix_condition keeps shapes at every split point
    for t in range(1, d.duration - 1):
        f = d.duration - t
        d2 = d.prefix_condition(data[..., :t, :])
        assert d2.batch_shape == d.batch_shape
        assert d2.event_shape == (f, obs_dim)


# ---------------------------------------------------------------------------
# value identities for the round-5 methods


def _random_hmm(T, hidden_dim=2, obs_dim=2, het=False):
    init_dist = random_mvn((), hidden_dim, 0)
    shape = (T,) if het else ()
    trans_mat = 0.5 * jax.random.normal(
        KEYS[10], shape + (hidden_dim, hidden_dim)
    )
    trans_dist = random_mvn(shape, hidden_dim, 2)
    obs_mat = jax.random.normal(KEYS[11], shape + (hidden_dim, obs_dim))
    obs_dist = random_mvn(shape, obs_dim, 4)
    return dist.GaussianHMM(
        init_dist, trans_mat, trans_dist, obs_mat, obs_dist, duration=T
    )


@pytest.mark.parametrize("het", [False, True], ids=["homog", "het"])
def test_conjugate_update_identity(het):
    """f.log_prob(x) + g.log_prob(x) == fg.log_prob(x) + log_normalizer
    (ref hmm.py:643-648)."""
    T, obs_dim = 5, 2
    f = _random_hmm(T, obs_dim=obs_dim, het=het)
    g_loc = jax.random.normal(KEYS[12], (T, obs_dim))
    g_scale = jnp.exp(0.3 * jax.random.normal(KEYS[13], (T, obs_dim)))
    g = dist.Normal(g_loc, g_scale).to_event(2)

    fg, log_normalizer = f.conjugate_update(g)
    for k in KEYS[:4]:
        x = f.rsample(k)
        lhs = f.log_prob(x) + g.log_prob(x)
        rhs = fg.log_prob(x) + log_normalizer
        np.testing.assert_allclose(
            float(lhs), float(rhs), rtol=1e-4, atol=1e-4
        )


@pytest.mark.parametrize("het", [False, True], ids=["homog", "het"])
@pytest.mark.parametrize("t", [1, 2, 4])
def test_prefix_condition_chain_rule(het, t):
    """p(x_full) == p(x_past) * p(x_future | x_past): the prefix-
    conditioned HMM is the exact posterior predictive (ref hmm.py:690)."""
    T, hidden_dim, obs_dim = 5, 2, 2
    d = _random_hmm(T, hidden_dim, obs_dim, het=het)
    x = d.rsample(KEYS[14])
    past, future = x[..., :t, :], x[..., t:, :]

    # the marginal over the first t steps is the same HMM truncated
    init_dist = random_mvn((), hidden_dim, 0)
    shape = (T,) if het else ()
    trans_mat = 0.5 * jax.random.normal(
        KEYS[10], shape + (hidden_dim, hidden_dim)
    )
    trans_dist = random_mvn(shape, hidden_dim, 2)
    obs_mat = jax.random.normal(KEYS[11], shape + (hidden_dim, obs_dim))
    obs_dist = random_mvn(shape, obs_dim, 4)
    if het:
        trans_mat, obs_mat = trans_mat[:t], obs_mat[:t]
        trans_dist = random_mvn((T,), hidden_dim, 2)  # same key -> same params
        obs_dist = random_mvn((T,), obs_dim, 4)
        trans_dist = dist.MultivariateNormal(
            trans_dist.loc[:t],
            covariance_matrix=trans_dist.covariance_matrix[:t],
        )
        obs_dist = dist.MultivariateNormal(
            obs_dist.loc[:t],
            covariance_matrix=obs_dist.covariance_matrix[:t],
        )
    left = dist.GaussianHMM(
        init_dist, trans_mat, trans_dist, obs_mat, obs_dist, duration=t
    )

    lp_joint = float(d.log_prob(x))
    lp_past = float(left.log_prob(past))
    lp_future = float(d.prefix_condition(past).log_prob(future))
    np.testing.assert_allclose(
        lp_joint, lp_past + lp_future, rtol=1e-4, atol=1e-4
    )


def test_conjugate_update_mvn_likelihood():
    """Independent MVN likelihoods are accepted too (ref hmm.py:656)."""
    T, obs_dim = 4, 2
    f = _random_hmm(T, obs_dim=obs_dim)
    base = random_mvn((T,), obs_dim, 6)
    g = base.to_event(1)
    fg, log_normalizer = f.conjugate_update(g)
    x = f.rsample(KEYS[15])
    lhs = float(f.log_prob(x) + g.log_prob(x))
    rhs = float(fg.log_prob(x) + log_normalizer)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# GammaGaussianHMM broadcast grid (ref test_gamma_gaussian_hmm_shape;
# combo set slimmed to bound XLA compile cost — each case is a distinct
# program)

GAMMA_GAUSSIAN_GRID = [
    # scale, init, trans_mat, trans_mvn, obs_mat, obs_mvn
    ((5,), (), (6,), (), (), ()),
    ((), (), (6,), (), (), ()),
    ((), (), (), (6,), (), ()),
    ((), (), (), (), (), (6,)),
    ((), (), (6,), (6,), (6,), (6,)),
    ((), (5,), (6,), (), (), ()),
    ((), (), (5, 1), (6,), (), ()),
    ((5,), (5,), (5, 6), (5, 6), (5, 6), (5, 6)),
]


@pytest.mark.parametrize("obs_dim, hidden_dim", [(1, 1), (2, 3)])
@pytest.mark.parametrize(
    "scale_shape, init_shape, trans_mat_shape, trans_mvn_shape, obs_mat_shape, obs_mvn_shape",
    GAMMA_GAUSSIAN_GRID,
    ids=str,
)
def test_gamma_gaussian_hmm_shape(
    scale_shape,
    init_shape,
    trans_mat_shape,
    trans_mvn_shape,
    obs_mat_shape,
    obs_mvn_shape,
    hidden_dim,
    obs_dim,
):
    init_dist = random_mvn(init_shape, hidden_dim, 0)
    trans_mat = jax.random.normal(
        KEYS[4], trans_mat_shape + (hidden_dim, hidden_dim)
    )
    trans_dist = random_mvn(trans_mvn_shape, hidden_dim, 2)
    obs_mat = jax.random.normal(
        KEYS[5], obs_mat_shape + (hidden_dim, obs_dim)
    )
    obs_dist = random_mvn(obs_mvn_shape, obs_dim, 4)
    conc = jnp.exp(jax.random.normal(KEYS[6], scale_shape))
    scale_dist = dist.Gamma(conc, conc)

    d = dist.GammaGaussianHMM(
        scale_dist, init_dist, trans_mat, trans_dist, obs_mat, obs_dist
    )

    shape = broadcast_shape(
        scale_shape + (1,),
        init_shape + (1,),
        trans_mat_shape,
        trans_mvn_shape,
        obs_mat_shape,
        obs_mvn_shape,
    )
    expected_batch_shape, time_shape = tuple(shape[:-1]), tuple(shape[-1:])
    expected_event_shape = time_shape + (obs_dim,)
    assert d.batch_shape == expected_batch_shape
    assert d.event_shape == expected_event_shape

    data = obs_dist.expand(tuple(shape)).sample(KEYS[7])
    assert data.shape == d.shape()
    actual = d.log_prob(data)
    assert actual.shape == expected_batch_shape
    assert np.isfinite(np.asarray(actual)).all()

    mixing, final = d.filter(data)
    assert isinstance(mixing, dist.Gamma)
    assert mixing.batch_shape == d.batch_shape
    assert mixing.event_shape == ()
    assert isinstance(final, dist.MultivariateNormal)
    assert final.batch_shape == d.batch_shape
    assert final.event_shape == (hidden_dim,)
