"""Hand-derived ubersum value tests + plate-structure error semantics.

Ports the reference ``tests/ops/test_contract.py:522-760`` (ubersum_1..5,
sizes, collide cases, shape/plate errors): each expected value is an
independent closed-form log-space computation, not a comparison against
another ubersum implementation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.scipy.special import logsumexp

from pyro_tpu.ops.contract import naive_ubersum, ubersum

IMPLS = [naive_ubersum, ubersum]


def _randn(key, *shape):
    return jax.random.normal(jax.random.key(key), shape)


def _allclose(actual, expected, atol=1e-4):
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), atol=atol, rtol=1e-4
    )


@pytest.mark.parametrize("a,b,c,d", [(2, 3, 4, 5), (1, 3, 1, 5), (2, 1, 4, 1)])
@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_sizes(impl, a, b, c, d):
    X = _randn(0, a, b)
    Y = _randn(1, b, c)
    Z = _randn(2, c, d)
    out_a, out_b, out_c, out_d = impl(
        "ab,bc,cd->a,b,c,d", X, Y, Z, plates="ad"
    )
    assert out_a.shape == (a,)
    assert out_b.shape == (b,)
    assert out_c.shape == (c,)
    assert out_d.shape == (d,)


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_1(impl):
    # y {a}   z {b}
    #      \  /
    #     x {}  <--- target
    a, b, c, d, e = 2, 3, 4, 5, 6
    x = _randn(0, c)
    y = _randn(1, c, d, a)
    z = _randn(2, e, c, b)
    (actual,) = impl("c,cda,ecb->", x, y, z, plates="ab")
    expected = logsumexp(
        x + logsumexp(y, -2).sum(-1) + logsumexp(z, -3).sum(-1), -1
    )
    _allclose(actual, expected)


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_2(impl):
    # y {a}   z {b}  <--- target b
    #      \  /
    #     x {}
    a, b, c, d, e = 2, 3, 4, 5, 6
    x = _randn(0, c)
    y = _randn(1, c, d, a)
    z = _randn(2, e, c, b)
    (actual,) = impl("c,cda,ecb->b", x, y, z, plates="ab")
    xyz = logsumexp(
        x + logsumexp(y, -2).sum(-1) + logsumexp(z, -3).sum(-1), -1
    )
    expected = jnp.broadcast_to(xyz, (b,))
    _allclose(actual, expected)


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_3(impl):
    #       z {b,c}
    #           |
    # w {a}  y {b}  <--- target be
    #      \  /
    #     x {}
    a, b, c, d, e = 2, 3, 4, 5, 6
    w = _randn(0, a, e)
    x = _randn(1, d)
    y = _randn(2, b, d)
    z = _randn(3, b, c, d, e)
    (actual,) = impl("ae,d,bd,bcde->be", w, x, y, z, plates="abc")
    yz = y.reshape(b, d, 1) + z.sum(-3)  # eliminate plate c
    yz = yz.sum(0)  # eliminate plate b
    wxyz = w.sum(0) + x.reshape(d, 1) + yz  # eliminate plate a
    wxyz = logsumexp(wxyz, 0)  # eliminate d
    expected = jnp.broadcast_to(wxyz, (b, e))
    _allclose(actual, expected)


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_4(impl):
    # x,y {d}  <--- target dc
    #      |
    #     {}
    a, b, c, d = 2, 3, 4, 5
    x = _randn(0, a, b)
    y = _randn(1, d, b, c)
    (actual,) = impl("ab,dbc->dc", x, y, plates="d")
    x_b1 = logsumexp(x, 0)[:, None]
    y_db1 = logsumexp(y, 2, keepdims=True)
    y_dbc = y_db1.sum(0) - y_db1 + y  # inclusion-exclusion over plate d
    expected = logsumexp(x_b1 + y_dbc, 1)
    assert expected.shape == (d, c)
    _allclose(actual, expected)


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_5(impl):
    # z {ij}  <--- target cij
    #     |
    #  y {i}
    #     |
    #  x {}
    i, j, a, b, c = 2, 3, 6, 5, 4
    x = _randn(0, a)
    y = _randn(1, a, b, i)
    z = _randn(2, b, c, i, j)
    (actual,) = impl("a,abi,bcij->cij", x, y, z, plates="ij")

    # contract plate j
    s1 = logsumexp(z, 1)  # (b, i, j)
    p1 = s1.sum(2)  # (b, i)
    q1 = z - s1[:, None]  # (b, c, i, j)
    # contract plate i
    x2 = y + p1  # (a, b, i)
    s2 = logsumexp(x2, 1)  # (a, i)
    p2 = s2.sum(1)  # (a,)
    q2 = x2 - s2[:, None]  # (a, b, i)
    # final contraction a,a,abi,bcij->cij in log space (tiny dims: dense)
    full = (
        (x + p2)[:, None, None, None, None]
        + q2[:, :, None, :, None]
        + q1[None]
    )  # (a, b, c, i, j)
    expected = logsumexp(full, (0, 1))
    _allclose(actual, expected)


def test_ubersum_collide_not_implemented():
    # Non-tree plates cause exponential blowup, so the optimized ubersum
    # refuses; the naive (plate-unrolling) implementation evaluates it.
    a, b, c, d = 2, 3, 4, 5
    x = _randn(0, a, c)
    y = _randn(1, b, d)
    z = _randn(2, a, b, c, d)
    with pytest.raises(
        NotImplementedError, match="tree-structured plate nesting"
    ):
        ubersum("ac,bd,abcd->", x, y, z, plates="ab")
    naive_ubersum("ac,bd,abcd->", x, y, z, plates="ab")


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_collide_ok_1(impl):
    # splits into connected components {x,z1} and {y,z2}
    a, b, c, d = 2, 3, 4, 5
    x = _randn(0, a, c)
    y = _randn(1, b, d)
    z1 = _randn(2, a, b, c)
    z2 = _randn(3, a, b, d)
    impl("ac,bd,abc,abd->", x, y, z1, z2, plates="ab")


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_collide_ok_2(impl):
    a, b, c, d = 2, 3, 4, 5
    w = _randn(0, c, d)
    x = _randn(1, a, c)
    y = _randn(2, b, d)
    z1 = _randn(3, a, b, c)
    z2 = _randn(4, a, b, d)
    impl("cd,ac,bd,abc,abd->", w, x, y, z1, z2, plates="ab")


@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_collide_ok_3(impl):
    a, b, c = 2, 3, 4
    w = _randn(0, c)
    x = _randn(1, a, c)
    y = _randn(2, b, c)
    z = _randn(3, a, b, c)
    impl("c,ac,bc,abc->", w, x, y, z, plates="ab")


def test_collide_components_agree():
    """The component-splitting path must still give the exact answer."""
    a, b, c, d = 2, 3, 4, 5
    x = _randn(0, a, c)
    y = _randn(1, b, d)
    z1 = _randn(2, a, b, c)
    z2 = _randn(3, a, b, d)
    (opt,) = ubersum("ac,bd,abc,abd->", x, y, z1, z2, plates="ab")
    (naive,) = naive_ubersum("ac,bd,abc,abd->", x, y, z1, z2, plates="ab")
    _allclose(opt, naive)


@pytest.mark.parametrize(
    "equation,shapes,plates",
    [("ab,bc->", [(2, 3), (4, 5)], ""), ("ab,bc->", [(2, 3), (4, 5)], "b")],
)
@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_size_error(impl, equation, shapes, plates):
    operands = [_randn(i, *s) for i, s in enumerate(shapes)]
    with pytest.raises(ValueError, match="mismatch|[Ss]ize"):
        impl(equation, *operands, plates=plates)


@pytest.mark.parametrize(
    "equation,plates",
    [
        ("ai->a", "i"),
        (",ai->a", "i"),
        ("bi,abi->b", "i"),
        (",bi,abi->b", "i"),
        ("aij->ai", "ij"),
        ("aij->aj", "ij"),
    ],
)
@pytest.mark.parametrize("impl", IMPLS, ids=["naive", "opt"])
def test_ubersum_plate_error(impl, equation, plates):
    inputs = equation.split("->")[0]
    operands = [
        _randn(i, *((2,) * len(spec)))
        for i, spec in enumerate(inputs.split(","))
    ]
    with pytest.raises(
        ValueError, match="nonsensical to preserve a plated dim"
    ):
        impl(equation, *operands, plates=plates)
