"""ubersum contraction sweep (ports the reference's
``tests/ops/test_contract.py`` UBERSUM_EXAMPLES registry): the optimized
plate-aware contraction must match the naive semantics on every
equation/plate combination, including multi-level plate nestings and
diamond-shaped factor graphs.
"""

import itertools

import jax
import numpy as np
import pytest

from pyro_tpu.ops.contract import naive_ubersum, ubersum

UBERSUM_EXAMPLES = [
    ("->", ""),
    ("a->,a", ""),
    ("ab->,a,b,ab,ba", ""),
    ("ab,bc->,a,b,c,ab,bc,ac,abc", ""),
    ("ab,bc,cd->,a,b,c,d,ab,ac,ad,bc,bd,cd,abc,acd,bcd,abcd", ""),
    ("i->,i", "i"),
    (",i->,i", "i"),
    (",i,i->,i", "i"),
    (",i,ia->,i,ia", "i"),
    (",i,i,ia,ia->,i,ia", "i"),
    ("bi,ia->,i,ia,ib,iab", "i"),
    ("abi,b->,b,ai,abi", "i"),
    ("ia,ja,ija->,a,i,ia,j,ja,ija", "ij"),
    ("i,jb,ijab->,i,j,jb,ij,ija,ijb,ijab", "ij"),
    ("ia,jb,ijab->,i,ia,j,jb,ij,ija,ijb,ijab", "ij"),
    (",i,j,a,ij,ia,ja,ija->,a,i,j,ia,ja,ij,ija", "ij"),
    ("a,b,c,di,ei,fj->,a,b,c,di,ei,fj", "ij"),
    ("ija,ika->,i,j,k,ij,ik,ijk,ia,ija,ika,ijka", "ijk"),
    (",ia,ija,ika->,i,j,k,ij,ik,ijk,ia,ija,ika,ijka", "ijk"),
    ("ab,bci->,a,b,ab,i,ai,bi,ci,abi,bci,abci", "i"),
    ("ab,bci,bdi->,a,b,ab,i,ai,bi,ci,abi,bci,bdi,cdi,abci,abdi,abcdi", "i"),
    (
        "ab,bcij->,a,b,ab,i,j,ij,ai,aj,aij,bi,bj,aij,bij,cij,abij,acij,"
        "bcij,abcij",
        "ij",
    ),
    ("abi,bcij->,i,ai,bi,abi,j,ij,aij,bij,cij,abij,bcij,abcij", "ij"),
    ("ab,bcdi,deij->,a,b,ci,di,eij", "ij"),
    ("ab,bcdi,defij,fgijk->,a,b,ci,di,eij,fij,gijk", "ijk"),
    ("aik,bij,abci,cd,dej,eij->,ai,bi,ej,aik,bij,eij", "ijk"),
    ("aij,abi,bc,cdj,dij->,bi,cj,aij,dij,adij", "ij"),
]


def make_operands(equation, sizes=(2, 3), seed=0):
    symbols = sorted(set(equation) - set(",->"))
    dim_sizes = {
        dim: size for dim, size in zip(symbols, itertools.cycle(sizes))
    }
    inputs = equation.split("->")[0].split(",")
    operands = []
    key = jax.random.key(seed)
    for dims in inputs:
        key, sub = jax.random.split(key)
        shape = tuple(dim_sizes[d] for d in dims)
        operands.append(jax.random.normal(sub, shape))
    return operands


def _normalize(x, dims, plates):
    """Per-plate-slice normalization (ref test_contract.py:87): under
    modulo-total semantics each plated result carries an arbitrary
    per-slice scale, so compare conditionals."""
    from jax.scipy.special import logsumexp

    total = x
    for i, d in enumerate(dims):
        if d not in plates:
            total = logsumexp(total, axis=i, keepdims=True)
    return x - total


@pytest.mark.parametrize(
    "equation,plates", UBERSUM_EXAMPLES, ids=[e for e, _ in UBERSUM_EXAMPLES]
)
def test_ubersum_matches_naive(equation, plates):
    operands = make_operands(equation)
    try:
        actual = ubersum(equation, *operands, plates=plates)
    except NotImplementedError:
        # non-tree plate couplings are rejected, as upstream
        # (ref test_contract.py:411 skips these)
        pytest.skip("non-tree plate nesting")
    expected = naive_ubersum(equation, *operands, plates=plates)
    outputs = equation.split("->")[1].split(",")
    assert len(actual) == len(expected) == len(outputs)
    for out, a, e in zip(outputs, actual, expected):
        assert jnp_shape(a) == tuple(jnp_shape(e)), (out, a.shape, e.shape)
        np.testing.assert_allclose(
            np.asarray(_normalize(a, out, plates)),
            np.asarray(_normalize(e, out, plates)),
            rtol=1e-4,
            atol=1e-4,
            err_msg=f"{equation} -> {out} (plates={plates})",
        )


def jnp_shape(x):
    import jax.numpy as jnp

    return tuple(jnp.shape(x))


def test_ubersum_total_logz_exact():
    """The scalar output is the exact total log-partition function."""
    ops = make_operands("ab,bci,bdi->", sizes=(2, 3))
    (actual,) = ubersum("ab,bci,bdi->", *ops, plates="i")
    (expected,) = naive_ubersum("ab,bci,bdi->", *ops, plates="i")
    np.testing.assert_allclose(
        float(actual), float(expected), rtol=1e-5
    )
