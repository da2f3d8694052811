"""MuE tests (mirrors ``tests/contrib/mue/``)."""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.special import logsumexp as scipy_lse

import pyro_tpu as pyro
from pyro_tpu.contrib.mue import (
    BiosequenceDataset,
    FactorMuE,
    MissingDataDiscreteHMM,
    Profile,
    ProfileHMM,
)

pytestmark = pytest.mark.stage("integration")


def _norm_logits(x):
    return x - scipy_lse(x, -1, keepdims=True)


def _brute_log_prob(init, trans, obs, idx):
    """Enumerate all state paths; idx entries None = missing."""
    K = init.shape[0]
    T = len(idx)
    li = _norm_logits(np.asarray(init))
    lt = _norm_logits(np.asarray(trans))
    lo = _norm_logits(np.asarray(obs))
    tot = []
    for path in itertools.product(range(K), repeat=T):
        lp = li[path[0]]
        for t in range(1, T):
            lp += lt[path[t - 1], path[t]]
        for t, i in enumerate(idx):
            if i is not None:
                lp += lo[path[t], i]
        tot.append(lp)
    return scipy_lse(tot)


@pytest.mark.parametrize("idx", [[1, 0, 1, 1], [1, 0, None, 1], [0, None, None, None]])
def test_missingdata_log_prob_vs_brute(idx):
    K, B = 3, 2
    rng = np.random.RandomState(0)
    init, trans, obs = rng.randn(K), rng.randn(K, K), rng.randn(K, B)
    d = MissingDataDiscreteHMM(
        jnp.asarray(init), jnp.asarray(trans), jnp.asarray(obs)
    )
    T = len(idx)
    value = np.zeros((T, B))
    for t, i in enumerate(idx):
        if i is not None:
            value[t, i] = 1
    lp = float(d.log_prob(jnp.asarray(value)[None])[0])
    assert np.allclose(lp, _brute_log_prob(init, trans, obs, idx), atol=1e-4)


def test_missingdata_variable_length():
    """Zero-padding the end equals the shorter sequence's likelihood."""
    K, B = 4, 3
    rng = np.random.RandomState(1)
    d = MissingDataDiscreteHMM(
        jnp.asarray(rng.randn(K)),
        jnp.asarray(rng.randn(K, K)),
        jnp.asarray(rng.randn(K, B)),
    )
    short = np.zeros((2, B))
    short[0, 1] = 1
    short[1, 2] = 1
    padded = np.concatenate([short, np.zeros((3, B))])
    lp_short = float(d.log_prob(jnp.asarray(short)[None])[0])
    lp_padded = float(d.log_prob(jnp.asarray(padded)[None])[0])
    assert np.allclose(lp_short, lp_padded, atol=1e-4)


def test_missingdata_smooth_and_viterbi():
    K, B, T = 3, 2, 5
    rng = np.random.RandomState(2)
    init, trans, obs = rng.randn(K), rng.randn(K, K), rng.randn(K, B)
    d = MissingDataDiscreteHMM(
        jnp.asarray(init), jnp.asarray(trans), jnp.asarray(obs)
    )
    idx = [1, 0, 1, 1, 0]
    value = np.zeros((T, B))
    for t, i in enumerate(idx):
        value[t, i] = 1
    v = jnp.asarray(value)[None]

    # brute-force posterior marginals
    li, lt, lo = (
        _norm_logits(init),
        _norm_logits(trans),
        _norm_logits(obs),
    )
    joint = {}
    for path in itertools.product(range(K), repeat=T):
        lp = li[path[0]]
        for t in range(1, T):
            lp += lt[path[t - 1], path[t]]
        for t, i in enumerate(idx):
            lp += lo[path[t], i]
        joint[path] = lp
    Z = scipy_lse(list(joint.values()))
    marg = np.zeros((T, K))
    for path, lp in joint.items():
        for t, s in enumerate(path):
            marg[t, s] += np.exp(lp - Z)

    smooth = np.exp(np.asarray(d.smooth(v))[0])
    assert np.allclose(smooth, marg, atol=1e-3)

    # Viterbi == brute-force MAP path
    map_path = max(joint, key=joint.get)
    vit = np.asarray(d.map_states(v))[0]
    assert tuple(vit) == map_path

    # FFBS frequencies approximate the marginals
    keys = jax.random.split(jax.random.key(0), 2000)
    states = jax.vmap(lambda k: d.sample_states(k, v))(keys)[:, 0, :]
    freqs = np.stack(
        [np.mean(np.asarray(states) == s, axis=0) for s in range(K)], -1
    )
    assert np.allclose(freqs, marg, atol=0.05)


@pytest.mark.parametrize("M", [1, 2, 4])
def test_profile_normalization(M):
    """Assembled HMM logits are normalized distributions for arbitrary
    normalized profile parameters."""
    B = 3
    rng = np.random.RandomState(M)
    pre = jnp.asarray(_norm_logits(rng.randn(M, B)))
    ins = jnp.asarray(_norm_logits(rng.randn(M + 1, B)))
    r = jnp.asarray(_norm_logits(rng.randn(M, 3, 2)))
    u = jnp.asarray(_norm_logits(rng.randn(M, 3, 2)))
    a0, a, e = Profile(M)(pre, ins, r, u)
    assert np.allclose(float(scipy_lse(np.asarray(a0))), 0.0, atol=1e-4)
    rows = scipy_lse(np.asarray(a), -1)
    assert np.allclose(rows, 0.0, atol=1e-4)
    assert np.allclose(scipy_lse(np.asarray(e), -1), 0.0, atol=1e-4)


def test_profile_substitution_matrix():
    M, B, D = 2, 3, 4
    rng = np.random.RandomState(5)
    pre = jnp.asarray(_norm_logits(rng.randn(M, D)))
    ins = jnp.asarray(_norm_logits(rng.randn(M + 1, D)))
    r = jnp.asarray(_norm_logits(rng.randn(M, 3, 2)))
    u = jnp.asarray(_norm_logits(rng.randn(M, 3, 2)))
    sub = jnp.asarray(_norm_logits(rng.randn(D, B)))
    a0, a, e = Profile(M)(pre, ins, r, u, sub)
    assert e.shape == (2 * M + 1, B)
    assert np.allclose(scipy_lse(np.asarray(e), -1), 0.0, atol=1e-4)


def test_biosequence_dataset():
    data = BiosequenceDataset(
        ["AATC", "CA", "T"], "list", "dna", include_stop=False
    )
    assert len(data) == 3
    assert data.max_length == 4
    assert data.seq_data.shape == (3, 4, 4)
    seq, L = data[0]
    assert float(L) == 4.0
    assert np.allclose(np.asarray(seq).sum(), 4.0)
    # padding rows are all zero (missing)
    seq1, L1 = data[1]
    assert float(L1) == 2.0
    assert np.allclose(np.asarray(seq1)[2:], 0.0)
    # custom alphabet + stop symbol
    data2 = BiosequenceDataset(["AB", "B"], "list", "AB", include_stop=True)
    assert data2.alphabet_length == 3
    assert data2.max_length == 3


def test_profile_hmm_fit():
    pyro.clear_param_store()
    data = BiosequenceDataset(["CAT", "CAA", "CAT", "GAT"], "list", "dna")
    model = ProfileHMM(3, 4, prior_scale=0.1, indel_prior_bias=5.0)
    losses = model.fit_svi(data, epochs=12, batch_size=2, learning_rate=0.05)
    assert losses[-1] < losses[0]
    lp, _, perplex, _ = model.evaluate(data)
    assert np.isfinite(lp) and perplex > 0


def test_factor_mue_fit_and_embed():
    pyro.clear_param_store()
    data = BiosequenceDataset(["CAT", "CAA", "GAT", "GAA"], "list", "dna")
    model = FactorMuE(
        data.max_length,
        data.alphabet_length,
        z_dim=2,
        batch_size=2,
        latent_seq_length=3,
        substitution_matrix=False,
    )
    losses = model.fit_svi(data, epochs=8, anneal_length=0.5, learning_rate=0.05)
    assert losses[-1] < losses[0]
    z_loc, z_scale = model.embed(data)
    assert z_loc.shape == (4, 2)
    assert np.all(np.asarray(z_scale) > 0)
    lp, _, perplex, _ = model.evaluate(data)
    assert np.isfinite(lp)
