"""Native vectorized_markov: parallel-scan enumeration over time.

Mirrors ``/root/reference/tests/contrib/funsor/test_vectorized_markov.py``
(models 0-7): for each model the TraceEnum_ELBO loss under
``pyro.vectorized_markov`` must equal the loss under unrolled
``pyro.markov`` to numerical precision, while tracing O(1) sites instead
of O(T).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import TraceEnum_ELBO
from pyro_tpu.ops.indexing import Vindex


def _probs(key, *shape):
    p = jax.random.uniform(jax.random.key(key), shape) + 0.1
    return p / p.sum(-1, keepdims=True)


def _markov_loop(vectorized, size, history=1):
    if vectorized:
        return pyro.vectorized_markov(
            name="time", size=size, dim=-2, history=history
        )
    return pyro.markov(range(size), history=history)


def ENUM():
    # fresh dict per site: the runtime stores per-site bookkeeping in infer
    return {"enumerate": "parallel"}


#     x[t-1] --> x[t] --> x[t+1]        (with an outer sequences plate)
def model_0(data, history, vectorized):
    x_dim = 3
    init = pyro.param("init", _probs(0, x_dim))
    trans = pyro.param("trans", _probs(1, x_dim, x_dim))
    locs = pyro.param("locs", jnp.array([-1.0, 0.0, 1.0]))
    tones = pyro.plate("tones", data.shape[2], dim=-1)
    with pyro.plate("sequences", data.shape[0], dim=-3) as sequences:
        sequences = sequences[:, None]
        x_prev = None
        for i in _markov_loop(vectorized, data.shape[1], history):
            x_curr = pyro.sample(
                f"x_{i}",
                dist.Categorical(
                    init if isinstance(i, int) and i < 1 else trans[x_prev]
                ),
                infer=ENUM(),
            )
            with tones:
                pyro.sample(
                    f"y_{i}",
                    dist.Normal(Vindex(locs)[..., x_curr], 1.0),
                    obs=Vindex(data)[sequences, i],
                )
            x_prev = x_curr


#     x[t-1] --> x[t] --> x[t+1]
def model_1(data, history, vectorized):
    x_dim = 3
    init = pyro.param("init", _probs(0, x_dim))
    trans = pyro.param("trans", _probs(1, x_dim, x_dim))
    locs = pyro.param("locs", jnp.array([-1.0, 0.0, 1.0]))
    tones = pyro.plate("tones", data.shape[-1], dim=-1)
    x_prev = None
    for i in _markov_loop(vectorized, len(data), history):
        x_curr = pyro.sample(
            f"x_{i}",
            dist.Categorical(
                init if isinstance(i, int) and i < 1 else trans[x_prev]
            ),
            infer=ENUM(),
        )
        with tones:
            pyro.sample(
                f"y_{i}",
                dist.Normal(Vindex(locs)[..., x_curr], 1.0),
                obs=data[i],
            )
        x_prev = x_curr


#     x[t-1] --> x[t];  y[t-1] --> y[t]  (y is an OBSERVED markov chain)
def model_2(data, history, vectorized):
    x_dim, y_dim = 3, 2
    x_init = pyro.param("x_init", _probs(0, x_dim))
    x_trans = pyro.param("x_trans", _probs(1, x_dim, x_dim))
    y_init = pyro.param("y_init", _probs(2, x_dim, y_dim))
    y_trans = pyro.param("y_trans", _probs(3, x_dim, y_dim, y_dim))
    tones = pyro.plate("tones", data.shape[-1], dim=-1)
    x_prev = y_prev = None
    for i in _markov_loop(vectorized, len(data), history):
        x_curr = pyro.sample(
            f"x_{i}",
            dist.Categorical(
                x_init if isinstance(i, int) and i < 1 else x_trans[x_prev]
            ),
            infer=ENUM(),
        )
        with tones:
            y_curr = pyro.sample(
                f"y_{i}",
                dist.Categorical(
                    y_init[x_curr]
                    if isinstance(i, int) and i < 1
                    else Vindex(y_trans)[x_curr, y_prev]
                ),
                obs=data[i],
            )
        x_prev, y_prev = x_curr, y_curr


#     two independent chains w and x, joint emission y
def model_3(data, history, vectorized):
    w_dim, x_dim, y_dim = 2, 3, 2
    w_init = pyro.param("w_init", _probs(0, w_dim))
    w_trans = pyro.param("w_trans", _probs(1, w_dim, w_dim))
    x_init = pyro.param("x_init", _probs(2, x_dim))
    x_trans = pyro.param("x_trans", _probs(3, x_dim, x_dim))
    y_probs = pyro.param("y_probs", _probs(4, w_dim, x_dim, y_dim))
    tones = pyro.plate("tones", data.shape[-1], dim=-1)
    w_prev = x_prev = None
    for i in _markov_loop(vectorized, len(data), history):
        w_curr = pyro.sample(
            f"w_{i}",
            dist.Categorical(
                w_init if isinstance(i, int) and i < 1 else w_trans[w_prev]
            ),
            infer=ENUM(),
        )
        x_curr = pyro.sample(
            f"x_{i}",
            dist.Categorical(
                x_init if isinstance(i, int) and i < 1 else x_trans[x_prev]
            ),
            infer=ENUM(),
        )
        with tones:
            pyro.sample(
                f"y_{i}",
                dist.Categorical(Vindex(y_probs)[w_curr, x_curr]),
                obs=data[i],
            )
        x_prev, w_prev = x_curr, w_curr


#     coupled chains: x[t] depends on w[t] and x[t-1]
def model_4(data, history, vectorized):
    w_dim, x_dim, y_dim = 2, 3, 2
    w_init = pyro.param("w_init", _probs(0, w_dim))
    w_trans = pyro.param("w_trans", _probs(1, w_dim, w_dim))
    x_init = pyro.param("x_init", _probs(2, w_dim, x_dim))
    x_trans = pyro.param("x_trans", _probs(3, w_dim, x_dim, x_dim))
    y_probs = pyro.param("y_probs", _probs(4, w_dim, x_dim, y_dim))
    tones = pyro.plate("tones", data.shape[-1], dim=-1)
    w_prev = x_prev = None
    for i in _markov_loop(vectorized, len(data), history):
        w_curr = pyro.sample(
            f"w_{i}",
            dist.Categorical(
                w_init if isinstance(i, int) and i < 1 else w_trans[w_prev]
            ),
            infer=ENUM(),
        )
        x_curr = pyro.sample(
            f"x_{i}",
            dist.Categorical(
                x_init[w_curr]
                if isinstance(i, int) and i < 1
                else Vindex(x_trans)[w_curr, x_prev]
            ),
            infer=ENUM(),
        )
        with tones:
            pyro.sample(
                f"y_{i}",
                dist.Categorical(Vindex(y_probs)[w_curr, x_curr]),
                obs=data[i],
            )
        x_prev, w_prev = x_curr, w_curr


#     second-order chain: x[t] depends on x[t-1] and x[t-2]
def model_5(data, history, vectorized):
    x_dim, y_dim = 3, 2
    x_init = pyro.param("x_init", _probs(0, x_dim))
    x_init_2 = pyro.param("x_init_2", _probs(1, x_dim, x_dim))
    x_trans = pyro.param("x_trans", _probs(2, x_dim, x_dim, x_dim))
    y_probs = pyro.param("y_probs", _probs(3, x_dim, y_dim))
    tones = pyro.plate("tones", data.shape[-1], dim=-1)
    x_prev = x_prev_2 = None
    for i in _markov_loop(vectorized, len(data), history):
        if isinstance(i, int) and i == 0:
            x_probs = x_init
        elif isinstance(i, int) and i == 1:
            x_probs = Vindex(x_init_2)[x_prev]
        else:
            x_probs = Vindex(x_trans)[x_prev_2, x_prev]
        x_curr = pyro.sample(f"x_{i}", dist.Categorical(x_probs), infer=ENUM())
        with tones:
            pyro.sample(
                f"y_{i}",
                dist.Categorical(Vindex(y_probs)[x_curr]),
                obs=data[i],
            )
        x_prev_2, x_prev = x_prev, x_curr


#     time-dependent transition matrices
def model_6(data, history, vectorized):
    x_dim = 3
    x_init = pyro.param("x_init", _probs(0, x_dim))
    x_trans = pyro.param("x_trans", _probs(1, len(data) - 1, x_dim, x_dim))
    locs = pyro.param("locs", jnp.array([-1.0, 0.0, 1.0]))
    tones = pyro.plate("tones", data.shape[-1], dim=-1)
    x_prev = None
    for i in _markov_loop(vectorized, len(data), history):
        if isinstance(i, int) and i < 1:
            x_probs = x_init
        elif isinstance(i, int):
            x_probs = x_trans[i - 1, x_prev]
        else:
            x_probs = Vindex(x_trans)[(i - 1)[:, None], x_prev]
        x_curr = pyro.sample(f"x_{i}", dist.Categorical(x_probs), infer=ENUM())
        with tones:
            pyro.sample(
                f"y_{i}",
                dist.Normal(Vindex(locs)[..., x_curr], 1.0),
                obs=data[i],
            )
        x_prev = x_curr


#     cross-coupled chains: w[t] <- x[t-1], x[t] <- w[t-1]
def model_7(data, history, vectorized):
    w_dim, x_dim, y_dim = 2, 3, 2
    w_init = pyro.param("w_init", _probs(0, w_dim))
    w_trans = pyro.param("w_trans", _probs(1, x_dim, w_dim))
    x_init = pyro.param("x_init", _probs(2, x_dim))
    x_trans = pyro.param("x_trans", _probs(3, w_dim, x_dim))
    y_probs = pyro.param("y_probs", _probs(4, w_dim, x_dim, y_dim))
    tones = pyro.plate("tones", data.shape[-1], dim=-1)
    w_prev = x_prev = None
    for i in _markov_loop(vectorized, len(data), history):
        w_curr = pyro.sample(
            f"w_{i}",
            dist.Categorical(
                w_init if isinstance(i, int) and i < 1 else w_trans[x_prev]
            ),
            infer=ENUM(),
        )
        x_curr = pyro.sample(
            f"x_{i}",
            dist.Categorical(
                x_init if isinstance(i, int) and i < 1 else x_trans[w_prev]
            ),
            infer=ENUM(),
        )
        with tones:
            pyro.sample(
                f"y_{i}",
                dist.Categorical(Vindex(y_probs)[w_curr, x_curr]),
                obs=data[i],
            )
        x_prev, w_prev = x_curr, w_curr


def _real_data(t, tones=4):
    return jax.random.normal(jax.random.key(99), (t, tones))


def _int_data(t, tones=4):
    return jnp.ones((t, tones), dtype=jnp.int32)


CASES = [
    (model_0, jax.random.normal(jax.random.key(98), (3, 5, 4)), 1),
    (model_1, _real_data(5), 1),
    (model_2, _int_data(5), 1),
    (model_3, _int_data(5), 1),
    (model_4, _int_data(5), 1),
    (model_5, _int_data(5), 2),
    (model_6, _real_data(5), 1),
    (model_6, _real_data(31), 1),
    (model_7, _int_data(5), 1),
    (model_7, _int_data(23), 1),
]


def _guide(data, history, vectorized):
    pass


@pytest.mark.parametrize(
    "model,data,history",
    CASES,
    ids=[f"{m.__name__}-T{np.shape(d)[-2]}-h{h}" for m, d, h in CASES],
)
def test_elbo_vectorized_equals_unrolled(model, data, history):
    elbo = TraceEnum_ELBO(max_plate_nesting=3)
    l_unroll = float(
        elbo.loss(model, _guide, data, history, False, rng_key=jax.random.key(0))
    )
    l_vec = float(
        elbo.loss(model, _guide, data, history, True, rng_key=jax.random.key(0))
    )
    assert np.isfinite(l_unroll)
    np.testing.assert_allclose(l_vec, l_unroll, rtol=1e-5, atol=1e-4)


def test_trace_structure_and_chain_record():
    data = _real_data(7)
    with poutine.trace() as tr:
        with poutine.enum(first_available_dim=-3):
            model_1(data, 1, True)
    nodes = tr.trace.nodes
    chain_node = nodes["_markov_chain_time"]
    assert chain_node["value"] == frozenset(
        {("x_0", "x_slice(0, 6, None)", "x_slice(1, 7, None)")}
    )
    # O(1) sites regardless of T: x_0, y_0, aux + final passes
    x_sites = [n for n in nodes if n.startswith("x_")]
    assert len(x_sites) == 3
    assert nodes["x_slice(0, 6, None)"]["infer"]["_do_not_score"]
    assert "_do_not_score" not in nodes["x_slice(1, 7, None)"]["infer"]


def test_large_T_stable_names():
    """T >= 1000: the yielded index's str() is the slice token, immune to
    numpy printoptions ellipsis, and the vectorized ELBO matches an exact
    numpy forward-algorithm oracle (unrolled comparison would be O(T) in
    Python; the oracle is exact because the guide is empty and all
    discrete latents are enumerated, so loss = -log p(data))."""
    T = 1200
    data = _real_data(T)
    elbo = TraceEnum_ELBO(max_plate_nesting=3)
    l_vec = float(
        elbo.loss(model_1, _guide, data, 1, True, rng_key=jax.random.key(0))
    )

    init = np.asarray(_probs(0, 3))
    trans = np.asarray(_probs(1, 3, 3))
    locs = np.array([-1.0, 0.0, 1.0])
    d = np.asarray(data)  # (T, tones)
    # emission log-prob per (t, state): sum over tones of Normal(locs, 1)
    emit = (
        -0.5 * (d[:, :, None] - locs) ** 2 - 0.5 * np.log(2 * np.pi)
    ).sum(1)
    from scipy.special import logsumexp

    alpha = np.log(init) + emit[0]
    for t in range(1, T):
        alpha = logsumexp(alpha[:, None] + np.log(trans), axis=0) + emit[t]
    np.testing.assert_allclose(l_vec, -logsumexp(alpha), rtol=1e-4)

    # trace-time structure is O(1) and names carry the stable slice token
    with poutine.trace() as tr:
        with poutine.enum(first_available_dim=-3):
            model_1(data, 1, True)
    names = set(tr.trace.nodes)
    assert f"x_slice(0, {T - 1}, None)" in names
    assert f"x_slice(1, {T}, None)" in names
    assert not any("..." in n for n in names)


def test_markov_index_token():
    from pyro_tpu.poutine.vectorized_markov import _MarkovIndex

    i = _MarkovIndex(slice(1, 2000))
    with np.printoptions(threshold=5):
        assert f"{i}" == "slice(1, 2000, None)"
        assert str(i - 1) != str(i)  # derived arrays print normally
        assert "..." not in str(i)
    np.testing.assert_array_equal(np.asarray(i), np.arange(1, 2000))
    assert int((i - 1)[0]) == 0


def test_sequential_fallback_identical_sites():
    """vectorized_markov with size too small degenerates to int yields."""
    data = _real_data(1)
    elbo = TraceEnum_ELBO(max_plate_nesting=3)
    l_unroll = float(
        elbo.loss(model_1, _guide, data, 1, False, rng_key=jax.random.key(0))
    )
    l_vec = float(
        elbo.loss(model_1, _guide, data, 1, True, rng_key=jax.random.key(0))
    )
    np.testing.assert_allclose(l_vec, l_unroll, rtol=1e-5)


def test_vectorized_markov_jits():
    """The whole vectorized ELBO compiles to one XLA program whose size
    does not grow with T (trace-time structure is O(1))."""
    data = _real_data(64)

    def loss_fn(data):
        elbo = TraceEnum_ELBO(max_plate_nesting=3)
        return elbo.differentiable_loss(
            model_1, _guide, data, 1, True, rng_key=jax.random.key(0)
        )

    loss = jax.jit(loss_fn)(data)
    assert np.isfinite(float(loss))
    # gradcheck through the parallel-scan elimination
    g = jax.grad(
        lambda d: jax.jit(loss_fn)(d)
    )(data)
    assert np.isfinite(np.asarray(g)).all()


def test_bf16_factor_storage_close_to_f32():
    """Opt-in bf16 enum-factor storage (settings.enum_factor_dtype):
    the scan streams half the HBM bytes; the loss and gradient must
    stay within bf16's ~3-decimal-digit storage error of the f32 run,
    and the f32 default must be bit-identical to not setting it."""
    import pyro_tpu.settings as settings
    from pyro_tpu.ops import markov_product

    data = _real_data(17)

    def loss_fn(data):
        elbo = TraceEnum_ELBO(max_plate_nesting=3)
        return elbo.differentiable_loss(
            model_1, _guide, data, 1, True, rng_key=jax.random.key(0)
        )

    assert settings.get("enum_factor_dtype") is None
    l_f32 = float(jax.jit(loss_fn)(data))
    g_f32 = np.asarray(jax.grad(lambda d: jax.jit(loss_fn)(d))(data))
    with settings.context(enum_factor_dtype=jnp.bfloat16):
        assert markov_product.FACTOR_DTYPE == jnp.bfloat16
        l_bf16 = float(jax.jit(loss_fn)(data))
        g_bf16 = np.asarray(jax.grad(lambda d: jax.jit(loss_fn)(d))(data))
    assert settings.get("enum_factor_dtype") is None
    # bf16 mantissa is 8 bits: ~4e-3 relative storage error in the log
    # factors, amplified ~linearly through the T-step sum
    np.testing.assert_allclose(l_bf16, l_f32, rtol=2e-2)
    assert np.isfinite(g_bf16).all()
    np.testing.assert_allclose(g_bf16, g_f32, rtol=0.1, atol=5e-2)
