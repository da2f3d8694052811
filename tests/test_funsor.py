"""Tests for the native funsor frontend (named-tensor term algebra,
DimStack runtime, to_funsor/to_data, and the backend namespace).

Mirrors the semantics exercised by the reference's
``tests/contrib/funsor`` suite (to_funsor/to_data round trips, named dim
allocation, enum/markov ELBO agreement) against the native
implementation in ``pyro_tpu/contrib/funsor``.
"""

from collections import OrderedDict

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
import pyro_tpu.contrib.funsor as funsor
from pyro_tpu.contrib.funsor import (
    Bint,
    Number,
    Real,
    Reals,
    Tensor,
    Variable,
    ops,
    to_data,
    to_funsor,
)
from pyro_tpu.contrib.funsor.runtime import _DIM_STACK, DimRequest, DimType
from pyro_tpu.contrib.funsor.terms import Binary, Reduce


def T(data, **inputs):
    return Tensor(jnp.asarray(data, jnp.float32),
                  OrderedDict((k, Bint(v)) for k, v in inputs.items()))


# ---------------------------------------------------------------------------
# term algebra


def test_binary_aligns_by_name_not_position():
    x = T(np.arange(6.0).reshape(2, 3), i=2, j=3)
    y = T(np.arange(6.0).reshape(3, 2), j=3, i=2)  # transposed layout
    z = x + y
    expected = np.arange(6.0).reshape(2, 3) + np.arange(6.0).reshape(3, 2).T
    np.testing.assert_allclose(np.asarray(z.align(["i", "j"]).data), expected)


def test_binary_broadcasts_disjoint_inputs():
    x = T(np.array([1.0, 2.0]), i=2)
    y = T(np.array([10.0, 20.0, 30.0]), j=3)
    z = x * y
    assert list(z.inputs) == ["i", "j"]
    np.testing.assert_allclose(
        np.asarray(z.data), np.outer([1.0, 2.0], [10.0, 20.0, 30.0])
    )


def test_event_shape_broadcasting():
    x = Tensor(jnp.ones((2, 4)), OrderedDict(i=Bint(2)))  # output Reals(4)
    y = Tensor(jnp.full((4,), 2.0))
    z = x + y
    assert z.output == Reals(4)
    np.testing.assert_allclose(np.asarray(z.data), np.full((2, 4), 3.0))


@pytest.mark.parametrize(
    "op, np_red",
    [
        (ops.add, lambda d, ax: d.sum(ax)),
        (ops.mul, lambda d, ax: d.prod(ax)),
        (ops.max, lambda d, ax: d.max(ax)),
        (ops.min, lambda d, ax: d.min(ax)),
        (
            ops.logaddexp,
            lambda d, ax: np.log(np.exp(d).sum(ax)),
        ),
    ],
    ids=lambda o: getattr(o, "name", ""),
)
def test_reduce_matches_dense(op, np_red):
    data = np.asarray(
        jax.random.normal(jax.random.key(0), (2, 3, 4)), np.float64
    )
    x = T(data, i=2, j=3, k=4)
    r = x.reduce(op, {"i", "k"})
    assert list(r.inputs) == ["j"]
    np.testing.assert_allclose(
        np.asarray(r.data), np_red(data, (0, 2)), rtol=1e-5
    )
    full = x.reduce(op)
    assert not full.inputs
    np.testing.assert_allclose(full.item(), np_red(data, (0, 1, 2)), rtol=1e-5)


def test_subs_int_and_rename():
    data = np.arange(6.0).reshape(2, 3)
    x = T(data, i=2, j=3)
    np.testing.assert_allclose(np.asarray(x(i=1).data), data[1])
    renamed = x(j=Variable("t", Bint(3)))
    assert list(renamed.inputs) == ["i", "t"]
    np.testing.assert_allclose(np.asarray(renamed.data), data)


def test_subs_gather_diagonal():
    data = np.arange(6.0).reshape(2, 3)
    x = T(data, i=2, j=3)
    idx = Tensor(jnp.array([2, 0]), OrderedDict(i=Bint(2)), dtype=3)
    g = x(j=idx)  # shares input 'i' with x -> diagonal gather
    assert list(g.inputs) == ["i"]
    np.testing.assert_allclose(np.asarray(g.data), [data[0, 2], data[1, 0]])


def test_subs_gather_new_input():
    data = np.arange(6.0).reshape(2, 3)
    x = T(data, i=2, j=3)
    idx = Tensor(jnp.array([1, 1, 0, 2]), OrderedDict(b=Bint(4)), dtype=3)
    g = x(j=idx)
    assert set(g.inputs) == {"i", "b"}
    got = np.asarray(g.align(["i", "b"]).data)
    np.testing.assert_allclose(got, data[:, [1, 1, 0, 2]])


def test_variable_materializes_in_ops():
    v = Variable("k", Bint(5))
    t = v * 2
    assert isinstance(t, Tensor) and list(t.inputs) == ["k"]
    np.testing.assert_allclose(np.asarray(t.data), 2.0 * np.arange(5))


def test_lazy_real_variable_evaluates_on_substitution():
    w = Variable("w", Real)
    expr = (w * 2.0 + 1.0).log()
    assert "w" in expr.inputs
    assert expr(w=3.0).item() == pytest.approx(np.log(7.0))
    # mixed with a named tensor
    x = T(np.array([1.0, 2.0]), i=2)
    mixed = x + w
    assert isinstance(mixed, Binary)
    assert set(mixed.inputs) == {"i", "w"}
    out = mixed(w=10.0)
    assert isinstance(out, Tensor)
    np.testing.assert_allclose(np.asarray(out.data), [11.0, 12.0])


def test_lazy_reduce_evaluates_after_substitution():
    w = Variable("w", Real)
    x = T(np.array([[0.0, 1.0], [2.0, 3.0]]), i=2, j=2)
    lazy = (x + w).reduce(ops.logaddexp, {"i"})
    assert isinstance(lazy, Reduce)
    got = lazy(w=0.5)
    expected = np.log(np.exp(np.array([[0.0, 1.0], [2.0, 3.0]]) + 0.5).sum(0))
    np.testing.assert_allclose(np.asarray(got.data), expected, rtol=1e-5)


def test_number_arithmetic():
    n = Number(2.0) + Number(3.0)
    assert n.item() == 5.0
    assert (Number(2.0) * T(np.ones(3), i=3)).inputs


def test_reduce_missing_input_raises():
    x = T(np.ones(2), i=2)
    with pytest.raises(ValueError):
        x.reduce(ops.add, {"zzz"})


# ---------------------------------------------------------------------------
# conversions


def test_to_funsor_to_data_roundtrip_event_shape():
    arr = jnp.asarray(np.random.RandomState(0).randn(3, 1, 4), jnp.float32)
    f = to_funsor(arr, Reals(4), dim_to_name={-2: "a"})
    assert list(f.inputs) == ["a"] and f.output == Reals(4)
    back = to_data(f, name_to_dim={"a": -2})
    np.testing.assert_allclose(np.asarray(back), np.asarray(arr))


def test_to_data_pads_skipped_dims():
    f = T(np.arange(2.0), i=2)
    out = to_data(f, name_to_dim={"i": -3})
    assert out.shape == (2, 1, 1)


def test_to_funsor_unnamed_batch_dim_raises_outside_context():
    with pytest.raises(ValueError):
        funsor.terms.to_funsor(jnp.ones((3, 2)))


def test_named_context_allocates_and_roundtrips():
    with funsor.named():
        f = to_funsor(jnp.ones((5, 1)))
        (name,) = f.inputs
        assert _DIM_STACK.global_frame[name] == -2
        back = to_data(f)
        assert back.shape == (5, 1)
    # binding is gone after the context exits
    assert name not in _DIM_STACK.global_frame


def test_dim_stack_reuses_and_allocates_fresh():
    with funsor.named():
        got = _DIM_STACK.allocate(
            OrderedDict([("x", DimRequest(None, DimType.GLOBAL))])
        )
        dim_x = got["x"]
        # repeated request reuses the binding
        again = _DIM_STACK.allocate(OrderedDict([("x", DimRequest())]))
        assert again["x"] == dim_x
        # a second name gets a different dim
        other = _DIM_STACK.allocate(OrderedDict([("y", DimRequest())]))
        assert other["y"] != dim_x


def test_dim_stack_visible_dims_start_at_minus_one():
    with funsor.named(first_available_dim=-3):
        got = _DIM_STACK.allocate(
            OrderedDict([("obs", DimRequest(None, DimType.VISIBLE))])
        )
        assert got["obs"] == -1
        deep = _DIM_STACK.allocate(OrderedDict([("e1", DimRequest())]))
        assert deep["e1"] <= -3


# ---------------------------------------------------------------------------
# the algebra computes real sum-products


def test_hmm_log_marginal_via_algebra_matches_dense():
    T_, S = 6, 4
    k1, k2 = jax.random.split(jax.random.key(3))
    trans = jax.nn.log_softmax(jax.random.normal(k1, (S, S)), axis=-1)
    emit = jax.random.normal(k2, (T_, S))

    logp = Tensor(emit[0], OrderedDict(x0=Bint(S)))
    for t in range(1, T_):
        tr = Tensor(
            trans, OrderedDict([(f"x{t-1}", Bint(S)), (f"x{t}", Bint(S))])
        )
        em = Tensor(emit[t], OrderedDict([(f"x{t}", Bint(S))]))
        logp = (logp + tr + em).reduce(ops.logaddexp, {f"x{t-1}"})
    Z = logp.reduce(ops.logaddexp).item()

    a = emit[0]
    for t in range(1, T_):
        a = jax.scipy.special.logsumexp(
            a[:, None] + trans + emit[t][None, :], axis=0
        )
    Zd = float(jax.scipy.special.logsumexp(a))
    assert Z == pytest.approx(Zd, rel=1e-5)


# ---------------------------------------------------------------------------
# backend namespace


def _enum_model(data):
    probs = pyro.param(
        "fz_probs",
        jnp.array([0.4, 0.6]),
        constraint=dist.constraints.simplex,
    )
    locs = pyro.param("fz_locs", jnp.array([-1.0, 1.0]))
    with funsor.plate("data", data.shape[0]):
        z = funsor.sample(
            "z", dist.Categorical(probs), infer={"enumerate": "parallel"}
        )
        funsor.sample("obs", dist.Normal(locs[z], 0.5), obs=data)


def test_funsor_namespace_enum_elbo_matches_native():
    data = jnp.array([0.3, -1.2, 0.8])
    pyro.clear_param_store()
    elbo_f = funsor.infer.TraceEnum_ELBO(max_plate_nesting=1)
    loss_f = elbo_f.loss(
        _enum_model, lambda d: None, data, rng_key=jax.random.key(0)
    )
    from pyro_tpu.infer import TraceEnum_ELBO

    loss_n = TraceEnum_ELBO(max_plate_nesting=1).loss(
        _enum_model, lambda d: None, data, rng_key=jax.random.key(0)
    )
    assert float(loss_f) == pytest.approx(float(loss_n), rel=1e-6)


def test_funsor_namespace_markov_enum():
    """TraceMarkovEnum_ELBO through the funsor namespace handles a
    vectorized_markov chain (ref infer/traceenum_elbo.py markov ELBO)."""
    probs = jax.nn.softmax(jax.random.normal(jax.random.key(1), (3, 3)))
    init = jnp.full((3,), 1 / 3)
    locs = jnp.array([-1.0, 0.0, 1.0])
    data = jax.random.normal(jax.random.key(2), (8,))

    def model(data):
        x_prev = None
        for i in funsor.vectorized_markov(name="time", size=len(data), dim=-1):
            x = funsor.sample(
                f"x_{i}",
                dist.Categorical(
                    init if isinstance(i, int) and i < 1 else probs[x_prev]
                ),
                infer={"enumerate": "parallel"},
            )
            funsor.sample(f"y_{i}", dist.Normal(locs[x], 1.0), obs=data[i])
            x_prev = x

    elbo = funsor.infer.TraceMarkovEnum_ELBO(max_plate_nesting=2)
    loss = elbo.loss(model, lambda d: None, data, rng_key=jax.random.key(0))
    assert np.isfinite(float(loss))


def test_pyroapi_backend_registered():
    from pyro_tpu.contrib.pyroapi import pyro_backend, pyro as generic_pyro

    with pyro_backend("contrib.funsor"):
        k = jax.random.key(0)
        from pyro_tpu import poutine

        with poutine.seed(rng_key=k):
            x = generic_pyro.sample("x", dist.Normal(0.0, 1.0))
        assert np.isfinite(float(x))
        assert generic_pyro.to_funsor is funsor.to_funsor


def test_namespace_surface_matches_reference():
    # ref pyro/contrib/funsor/__init__.py __all__
    for name in [
        "clear_param_store", "condition", "deterministic", "do",
        "enable_validation", "factor", "get_param_store", "markov",
        "module", "param", "random_module", "sample", "set_rng_seed",
        "subsample", "to_data", "to_funsor", "vectorized_markov", "plate",
    ]:
        assert hasattr(funsor, name), name
    for name in [
        "ELBO", "SVI", "Trace_ELBO", "JitTrace_ELBO", "TraceEnum_ELBO",
        "JitTraceEnum_ELBO", "TraceMarkovEnum_ELBO",
        "JitTraceMarkovEnum_ELBO", "TraceTMC_ELBO", "JitTraceTMC_ELBO",
        "infer_discrete", "config_enumerate",
    ]:
        assert hasattr(funsor.infer, name), name
