"""MuE Profile state-arranger correctness.

Ports the brute-force Eqn-S40 checks from reference
``tests/contrib/mue/test_statearrangers.py``: the arranger's einsum
assembly of HMM (initial, transition, emission) logits must equal a
direct per-index reimplementation of the MuE transition equations, the
output shapes/normalizations must hold under every batching pattern, and
the zero-indel limit must reduce to ancestral-sequence x substitution.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pyro_tpu.contrib.mue.statearrangers import Profile, mg2k


def simpleprod(lst):
    out = 1.0
    for x in lst:
        out *= float(x)
    return out


@pytest.mark.parametrize("M", [2, 20])
@pytest.mark.parametrize("batch_size", [None, 5])
@pytest.mark.parametrize("substitute", [False, True])
def test_profile_alternate_imp(M, batch_size, substitute):
    rng = np.random.RandomState(hash(("mue", M, batch_size, substitute)) % (2**31))
    pf_arranger = Profile(M)

    u1 = rng.rand(M + 1, 3)
    u1[M, :] = 0.0
    r1 = rng.rand(M + 1, 3)
    r1[M, :] = 1.0
    r = np.stack([1 - r1, r1], axis=2)
    u = np.stack([1 - u1, u1], axis=2)
    s = rng.rand(M, 4)
    s = s / s.sum(axis=1, keepdims=True)
    c = rng.rand(M + 1, 4)
    c = c / c.sum(axis=1, keepdims=True)

    if batch_size is not None:
        s = rng.rand(batch_size, M, 4)
        s = s / s.sum(axis=2, keepdims=True)
        u1 = rng.rand(batch_size, M + 1, 3)
        u1[:, M, :] = 0.0
        u = np.stack([1 - u1, u1], axis=3)

    ll = None
    if substitute:
        ll = rng.rand(4, 5)
        ll = ll / ll.sum(axis=1, keepdims=True)

    args = [
        jnp.log(s),
        jnp.log(c),
        jnp.log(r[:-1, :]),
        jnp.log(u[..., :-1, :, :]),
    ]
    if substitute:
        args.append(jnp.log(ll))
    a0ln, aln, eln = pf_arranger.forward(*args)
    a0 = np.exp(np.asarray(a0ln))
    a = np.exp(np.asarray(aln))
    e = np.exp(np.asarray(eln))

    # Brute-force Eqn S40 (MuE paper) per-index reimplementation.
    K = 2 * M + 1
    if batch_size is None:
        B = 1
        r1b = r1[None]
        u1b = u1[None]
        sb = s[None]
        cb = c[None]
    else:
        B = batch_size
        r1b = np.broadcast_to(r1[None], (B,) + r1.shape).copy()
        u1b = u1.copy()
        sb = s
        cb = np.broadcast_to(c[None], (B,) + c.shape).copy()

    expected_a = np.zeros((B, K, K))
    expected_a0 = np.zeros((B, K))
    expected_e = np.zeros((B, K, 4))
    for b in range(B):
        u1b[b][-1] = 1e-32
        m, g = -1, 0
        for gp in range(2):
            for mp in range(M + gp):
                kp = mg2k(mp, gp, M)
                if m + 1 - g == mp and gp == 0:
                    expected_a0[b, kp] = (1 - r1b[b, m + 1 - g, g]) * (
                        1 - u1b[b, m + 1 - g, g]
                    )
                elif m + 1 - g < mp and gp == 0:
                    expected_a0[b, kp] = (
                        (1 - r1b[b, m + 1 - g, g])
                        * u1b[b, m + 1 - g, g]
                        * simpleprod(
                            [
                                (1 - r1b[b, mpp, 2]) * u1b[b, mpp, 2]
                                for mpp in range(m + 2 - g, mp)
                            ]
                        )
                        * (1 - r1b[b, mp, 2])
                        * (1 - u1b[b, mp, 2])
                    )
                elif m + 1 - g == mp and gp == 1:
                    expected_a0[b, kp] = r1b[b, m + 1 - g, g]
                elif m + 1 - g < mp and gp == 1:
                    expected_a0[b, kp] = (
                        (1 - r1b[b, m + 1 - g, g])
                        * u1b[b, m + 1 - g, g]
                        * simpleprod(
                            [
                                (1 - r1b[b, mpp, 2]) * u1b[b, mpp, 2]
                                for mpp in range(m + 2 - g, mp)
                            ]
                        )
                        * r1b[b, mp, 2]
                    )
        for g in range(2):
            for m in range(M + g):
                k = mg2k(m, g, M)
                for gp in range(2):
                    for mp in range(M + gp):
                        kp = mg2k(mp, gp, M)
                        if m + 1 - g == mp and gp == 0:
                            expected_a[b, k, kp] = (1 - r1b[b, m + 1 - g, g]) * (
                                1 - u1b[b, m + 1 - g, g]
                            )
                        elif m + 1 - g < mp and gp == 0:
                            expected_a[b, k, kp] = (
                                (1 - r1b[b, m + 1 - g, g])
                                * u1b[b, m + 1 - g, g]
                                * simpleprod(
                                    [
                                        (1 - r1b[b, mpp, 2]) * u1b[b, mpp, 2]
                                        for mpp in range(m + 2 - g, mp)
                                    ]
                                )
                                * (1 - r1b[b, mp, 2])
                                * (1 - u1b[b, mp, 2])
                            )
                        elif m + 1 - g == mp and gp == 1:
                            expected_a[b, k, kp] = r1b[b, m + 1 - g, g]
                        elif m + 1 - g < mp and gp == 1:
                            expected_a[b, k, kp] = (
                                (1 - r1b[b, m + 1 - g, g])
                                * u1b[b, m + 1 - g, g]
                                * simpleprod(
                                    [
                                        (1 - r1b[b, mpp, 2]) * u1b[b, mpp, 2]
                                        for mpp in range(m + 2 - g, mp)
                                    ]
                                )
                                * r1b[b, mp, 2]
                            )
                        elif m == M and mp == M and g == 0 and gp == 0:
                            expected_a[b, k, kp] = 1.0
        for g in range(2):
            for m in range(M + g):
                k = mg2k(m, g, M)
                expected_e[b, k, :] = sb[b, m, :] if g == 0 else cb[b, m, :]

    if substitute:
        expected_e = expected_e @ ll

    if batch_size is None:
        expected_a = expected_a[0]
        expected_a0 = expected_a0[0]
        expected_e = expected_e[0]
        assert np.allclose(a0.sum(), 1.0, atol=1e-3, rtol=1e-3)
        assert np.allclose(a.sum(axis=1), np.ones(K), atol=1e-3, rtol=1e-3)

    assert np.allclose(expected_a0, a0, atol=1e-5)
    assert np.allclose(expected_a, a, atol=1e-5)
    assert np.allclose(expected_e, e, atol=1e-5)


@pytest.mark.parametrize("batch_ancestor_seq", [False, True])
@pytest.mark.parametrize("batch_insert", [False, True])
@pytest.mark.parametrize("batch_substitute", [False, True])
def test_profile_shapes(batch_ancestor_seq, batch_insert, batch_substitute):
    """Shape/normalization matrix (ref test_profile_shapes, condensed:
    insert-seq batching follows ancestor-seq, delete follows insert)."""
    rng = np.random.RandomState(0)
    M, D, B = 5, 2, 3
    K = 2 * M + 1
    batch_size = 6
    pf_arranger = Profile(M)

    def norm(x):
        x = jnp.asarray(x)
        from jax.scipy.special import logsumexp

        return x - logsumexp(x, axis=-1, keepdims=True)

    sln = norm(rng.randn(*([batch_size] * batch_ancestor_seq + [M, D])))
    cln = norm(rng.randn(*([batch_size] * batch_ancestor_seq + [M + 1, D])))
    rln = norm(rng.randn(*([batch_size] * batch_insert + [M, 3, 2])))
    uln = norm(rng.randn(*([batch_size] * batch_insert + [M, 3, 2])))
    lln = norm(rng.randn(*([batch_size] * batch_substitute + [D, B])))
    a0ln, aln, eln = pf_arranger.forward(sln, cln, rln, uln, lln)

    from jax.scipy.special import logsumexp

    if not batch_ancestor_seq and not batch_substitute:
        assert eln.shape == (K, B)
        assert np.allclose(logsumexp(eln, -1), np.zeros(K), atol=1e-5)
    else:
        assert eln.shape == (batch_size, K, B)
        assert np.allclose(
            logsumexp(eln, -1), np.zeros((batch_size, K)), atol=1e-5
        )

    if not batch_insert:
        assert a0ln.shape == (K,)
        assert np.allclose(logsumexp(a0ln, -1), 0.0, atol=1e-3)
        assert aln.shape == (K, K)
        # the final state k=2M is unreachable filler; exclude it
        row_norm = np.asarray(logsumexp(aln, -1))
        assert np.allclose(row_norm[: K - 1], np.zeros(K - 1), atol=1e-3)
    else:
        assert a0ln.shape == (batch_size, K)
        assert aln.shape == (batch_size, K, K)
        row_norm = np.asarray(logsumexp(aln, -1))
        assert np.allclose(
            row_norm[:, : K - 1], np.zeros((batch_size, K - 1)), atol=1e-3
        )


@pytest.mark.parametrize("M", [2, 20])
def test_profile_trivial_cases(M):
    """Zero indel probability => per-step expected emission equals the
    ancestral sequence pushed through the substitution matrix."""
    rng = np.random.RandomState(1)
    D, B = 2, 2
    batch_size = 5
    pf_arranger = Profile(M)

    def norm(x):
        from jax.scipy.special import logsumexp

        x = jnp.asarray(x)
        return x - logsumexp(x, axis=-1, keepdims=True)

    sln = norm(rng.randn(batch_size, M, D))
    cln = norm(rng.randn(batch_size, M + 1, D))
    rln = jnp.concatenate(
        [
            jnp.zeros((M, 3, 1)),
            -1 / pf_arranger.epsilon * jnp.ones((M, 3, 1)),
        ],
        axis=-1,
    )
    uln = rln
    lln = norm(rng.randn(D, B))

    a0ln, aln, eln = pf_arranger.forward(sln, cln, rln, uln, lln)

    from jax.scipy.special import logsumexp

    Ey = np.zeros((batch_size, M, B))
    ai = a0ln
    for j in range(M):
        Ey[:, j, :] = np.asarray(logsumexp(ai[..., None] + eln, axis=-2))
        ai = logsumexp(ai[..., None] + aln, axis=-2)

    no_indel = np.asarray(logsumexp(sln[..., None] + lln[..., None, :, :], axis=-2))
    assert np.allclose(Ey, no_indel, atol=1e-4)
