"""Enumerated-ELBO plate-interaction correctness: vectorized-plate models
must give the SAME loss and parameter gradients as their hand-unrolled
(sequential-plate) equivalents.

Ports the core of the reference's ``tests/infer/test_enum.py``
``test_elbo_enumerate_plate_{1,2,4,6,7}`` / ``plates_1`` family — the
flagship tests of TraceEnum_ELBO's tensor-tree contraction across plates,
mixed model/guide enumeration, masks, and poutine.scale.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import TraceEnum_ELBO, config_enumerate
from pyro_tpu.infer.svi import ParamsMessenger
from pyro_tpu.ops.indexing import Vindex


def _loss_and_grads(elbo, model, guide, *args):
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(
                model, guide, *args, rng_key=jax.random.key(0)
            )

    loss, grads = jax.value_and_grad(loss_fn)(params)
    return float(loss), {k: np.asarray(v) for k, v in grads.items()}


def _check_loss_and_grads(expected, actual, rtol=1e-4, atol=1e-5, skip=()):
    """``skip``: params whose gradient estimator legitimately differs
    pointwise between the plated and unrolled programs (the plated DiCE
    weighting Rao-Blackwellizes a sampled guide site's score per plate
    slot; the unrolled program cross-products root-ordinal scores — both
    unbiased, not pointwise equal.  The reference's exact-equality
    version of this check is vacuous there: its [0,1]-deterministic
    guide saturates that gradient to zero on both sides)."""
    e_loss, e_grads = expected
    a_loss, a_grads = actual
    np.testing.assert_allclose(a_loss, e_loss, rtol=rtol, atol=atol)
    for name in e_grads:
        if name in skip:
            continue
        np.testing.assert_allclose(
            a_grads[name], e_grads[name], rtol=1e-3, atol=1e-4,
            err_msg=name,
        )


def _simplex_param(name, value):
    pyro.param(
        name, jnp.asarray(value), constraint=constraints.simplex
    )


@pytest.mark.parametrize("scale", [1, 10])
@pytest.mark.parametrize(
    "num_samples,num_masked",
    [(1, 1), (2, 2), (3, 2)],
    ids=["single", "batch", "masked"],
)
def test_elbo_enumerate_plate_1(num_samples, num_masked, scale):
    #              +---------+
    #  x ----> y ----> z     |
    #              |       N |
    #              +---------+
    pyro.clear_param_store()
    _simplex_param("guide_probs_x", [0.1, 0.9])
    _simplex_param("model_probs_x", [0.4, 0.6])
    _simplex_param("model_probs_y", [[0.75, 0.25], [0.55, 0.45]])
    _simplex_param("model_probs_z", [[0.3, 0.7], [0.2, 0.8]])

    def auto_model(data):
        probs_x = pyro.param("model_probs_x")
        probs_y = pyro.param("model_probs_y")
        probs_z = pyro.param("model_probs_z")
        x = pyro.sample("x", dist.Categorical(probs_x))
        with poutine.scale(scale=scale):
            y = pyro.sample(
                "y",
                dist.Categorical(probs_y[x]),
                infer={"enumerate": "parallel"},
            )
            with pyro.plate("data", len(data)):
                with poutine.mask(
                    mask=jnp.arange(num_samples) < num_masked
                ):
                    pyro.sample("z", dist.Categorical(probs_z[y]), obs=data)

    def hand_model(data):
        probs_x = pyro.param("model_probs_x")
        probs_y = pyro.param("model_probs_y")
        probs_z = pyro.param("model_probs_z")
        x = pyro.sample("x", dist.Categorical(probs_x))
        with poutine.scale(scale=scale):
            y = pyro.sample(
                "y",
                dist.Categorical(probs_y[x]),
                infer={"enumerate": "parallel"},
            )
            for i in pyro.plate("data", num_masked):
                pyro.sample(
                    f"z_{i}", dist.Categorical(probs_z[y]), obs=data[i]
                )

    @config_enumerate
    def guide(data):
        probs_x = pyro.param("guide_probs_x")
        pyro.sample("x", dist.Categorical(probs_x))

    data = dist.Categorical(jnp.asarray([0.3, 0.7])).sample(
        jax.random.key(1), (num_samples,)
    )
    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), auto_model, guide, data
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, guide, data
    )
    _check_loss_and_grads(hand, auto)


@pytest.mark.parametrize("scale", [1, 10])
@pytest.mark.parametrize(
    "num_samples,num_masked",
    [(1, 1), (2, 2), (3, 2)],
    ids=["single", "batch", "masked"],
)
def test_elbo_enumerate_plate_2(num_samples, num_masked, scale):
    #      +-----------------+
    #  x ----> y ----> z     |
    #      |               N |
    #      +-----------------+
    pyro.clear_param_store()
    _simplex_param("guide_probs_x", [0.1, 0.9])
    _simplex_param("model_probs_x", [0.4, 0.6])
    _simplex_param("model_probs_y", [[0.75, 0.25], [0.55, 0.45]])
    _simplex_param("model_probs_z", [[0.3, 0.7], [0.2, 0.8]])

    def auto_model(data):
        probs_x = pyro.param("model_probs_x")
        probs_y = pyro.param("model_probs_y")
        probs_z = pyro.param("model_probs_z")
        x = pyro.sample("x", dist.Categorical(probs_x))
        with poutine.scale(scale=scale):
            with pyro.plate("data", len(data)):
                with poutine.mask(
                    mask=jnp.arange(num_samples) < num_masked
                ):
                    y = pyro.sample(
                        "y",
                        dist.Categorical(probs_y[x]),
                        infer={"enumerate": "parallel"},
                    )
                    pyro.sample("z", dist.Categorical(probs_z[y]), obs=data)

    def hand_model(data):
        probs_x = pyro.param("model_probs_x")
        probs_y = pyro.param("model_probs_y")
        probs_z = pyro.param("model_probs_z")
        x = pyro.sample("x", dist.Categorical(probs_x))
        with poutine.scale(scale=scale):
            for i in pyro.plate("data", num_masked):
                y = pyro.sample(
                    f"y_{i}",
                    dist.Categorical(probs_y[x]),
                    infer={"enumerate": "parallel"},
                )
                pyro.sample(
                    f"z_{i}", dist.Categorical(probs_z[y]), obs=data[i]
                )

    @config_enumerate
    def guide(data):
        probs_x = pyro.param("guide_probs_x")
        pyro.sample("x", dist.Categorical(probs_x))

    data = dist.Categorical(jnp.asarray([0.3, 0.7])).sample(
        jax.random.key(1), (num_samples,)
    )
    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), auto_model, guide, data
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), hand_model, guide, data
    )
    _check_loss_and_grads(hand, auto)


@pytest.mark.parametrize("scale", [1, 10])
@pytest.mark.parametrize(
    "outer_obs,inner_obs", [(False, True), (True, False), (True, True)]
)
def test_elbo_enumerate_plate_4(outer_obs, inner_obs, scale):
    #    a ---> outer_obs
    #      \
    #  +-----\------------------+
    #  |       \                |
    #  | b ---> inner_obs   N=2 |
    #  +------------------------+
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.4, 0.6])
    _simplex_param("probs_b", [0.6, 0.4])
    pyro.param("locs", jnp.asarray([-1.0, 1.0]))
    pyro.param(
        "scales", jnp.asarray([1.0, 2.0]), constraint=constraints.positive
    )
    outer_data = jnp.asarray(2.0)
    inner_data = jnp.asarray([0.5, 1.5])

    @poutine.scale(scale=scale)
    def auto_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        locs = pyro.param("locs")
        scales = pyro.param("scales")
        a = pyro.sample(
            "a", dist.Categorical(probs_a), infer={"enumerate": "parallel"}
        )
        if outer_obs:
            pyro.sample(
                "outer_obs", dist.Normal(0.0, scales[a]), obs=outer_data
            )
        with pyro.plate("inner", 2):
            b = pyro.sample(
                "b",
                dist.Categorical(probs_b),
                infer={"enumerate": "parallel"},
            )
            if inner_obs:
                pyro.sample(
                    "inner_obs",
                    dist.Normal(locs[b], scales[a]),
                    obs=inner_data,
                )

    @poutine.scale(scale=scale)
    def hand_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        locs = pyro.param("locs")
        scales = pyro.param("scales")
        a = pyro.sample(
            "a", dist.Categorical(probs_a), infer={"enumerate": "parallel"}
        )
        if outer_obs:
            pyro.sample(
                "outer_obs", dist.Normal(0.0, scales[a]), obs=outer_data
            )
        for i in pyro.plate("inner", 2):
            b = pyro.sample(
                f"b_{i}",
                dist.Categorical(probs_b),
                infer={"enumerate": "parallel"},
            )
            if inner_obs:
                pyro.sample(
                    f"inner_obs_{i}",
                    dist.Normal(locs[b], scales[a]),
                    obs=inner_data[i],
                )

    def guide():
        pass

    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), auto_model, guide
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, guide
    )
    _check_loss_and_grads(hand, auto)


def test_elbo_enumerate_plate_6():
    #     Guide           Model
    #           +-------+
    #       b ----> c <---- a
    #           |  M=2  |
    #           +-------+
    # model-side enumeration moves c into b's plate via contraction
    pyro.clear_param_store()
    _simplex_param("model_probs_a", [0.45, 0.55])
    _simplex_param("model_probs_b", [0.6, 0.4])
    _simplex_param(
        "model_probs_c",
        [
            [[0.4, 0.5, 0.1], [0.3, 0.5, 0.2]],
            [[0.3, 0.4, 0.3], [0.4, 0.4, 0.2]],
        ],
    )
    _simplex_param("guide_probs_b", [0.8, 0.2])
    data = jnp.asarray([1, 2])

    @config_enumerate
    def model_plate():
        probs_a = pyro.param("model_probs_a")
        probs_b = pyro.param("model_probs_b")
        probs_c = pyro.param("model_probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        b = pyro.sample("b", dist.Categorical(probs_b))
        with pyro.plate("b_axis", 2):
            pyro.sample(
                "c", dist.Categorical(Vindex(probs_c)[a, b]), obs=data
            )

    @config_enumerate
    def model_iplate():
        probs_a = pyro.param("model_probs_a")
        probs_b = pyro.param("model_probs_b")
        probs_c = pyro.param("model_probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        b = pyro.sample("b", dist.Categorical(probs_b))
        for i in pyro.plate("b_axis", 2):
            pyro.sample(
                f"c_{i}",
                dist.Categorical(Vindex(probs_c)[a, b]),
                obs=data[i],
            )

    @config_enumerate
    def guide():
        probs_b = pyro.param("guide_probs_b")
        pyro.sample("b", dist.Categorical(probs_b))

    expected = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), model_iplate, guide
    )
    actual = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), model_plate, guide
    )
    _check_loss_and_grads(expected, actual)


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plate_7(scale):
    #  Guide    Model
    #    a -----> b
    #    |        |
    #  +-|--------|----------------+
    #  | V        V                |
    #  | c -----> d -----> e   N=2 |
    #  +---------------------------+
    # mixture of model and guide enumeration
    pyro.clear_param_store()
    _simplex_param("model_probs_a", [0.45, 0.55])
    _simplex_param("model_probs_b", [[0.6, 0.4], [0.4, 0.6]])
    _simplex_param("model_probs_c", [[0.75, 0.25], [0.55, 0.45]])
    _simplex_param(
        "model_probs_d",
        [[[0.4, 0.6], [0.3, 0.7]], [[0.3, 0.7], [0.2, 0.8]]],
    )
    _simplex_param("model_probs_e", [[0.75, 0.25], [0.55, 0.45]])
    _simplex_param("guide_probs_a", [0.35, 0.64])
    _simplex_param("guide_probs_c", [[0.001, 0.999], [0.999, 0.001]])

    @poutine.scale(scale=scale)
    def auto_model(data):
        probs_a = pyro.param("model_probs_a")
        probs_b = pyro.param("model_probs_b")
        probs_c = pyro.param("model_probs_c")
        probs_d = pyro.param("model_probs_d")
        probs_e = pyro.param("model_probs_e")
        a = pyro.sample("a", dist.Categorical(probs_a))
        b = pyro.sample(
            "b", dist.Categorical(probs_b[a]), infer={"enumerate": "parallel"}
        )
        with pyro.plate("data", 2):
            c = pyro.sample("c", dist.Categorical(probs_c[a]))
            d = pyro.sample(
                "d",
                dist.Categorical(Vindex(probs_d)[b, c]),
                infer={"enumerate": "parallel"},
            )
            pyro.sample("obs", dist.Categorical(probs_e[d]), obs=data)

    @poutine.scale(scale=scale)
    def auto_guide(data):
        probs_a = pyro.param("guide_probs_a")
        probs_c = pyro.param("guide_probs_c")
        a = pyro.sample(
            "a", dist.Categorical(probs_a), infer={"enumerate": "parallel"}
        )
        with pyro.plate("data", 2):
            pyro.sample("c", dist.Categorical(probs_c[a]))

    @poutine.scale(scale=scale)
    def hand_model(data):
        probs_a = pyro.param("model_probs_a")
        probs_b = pyro.param("model_probs_b")
        probs_c = pyro.param("model_probs_c")
        probs_d = pyro.param("model_probs_d")
        probs_e = pyro.param("model_probs_e")
        a = pyro.sample("a", dist.Categorical(probs_a))
        b = pyro.sample(
            "b", dist.Categorical(probs_b[a]), infer={"enumerate": "parallel"}
        )
        for i in pyro.plate("data", 2):
            c = pyro.sample(f"c_{i}", dist.Categorical(probs_c[a]))
            d = pyro.sample(
                f"d_{i}",
                dist.Categorical(Vindex(probs_d)[b, c]),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(
                f"obs_{i}", dist.Categorical(probs_e[d]), obs=data[i]
            )

    @poutine.scale(scale=scale)
    def hand_guide(data):
        probs_a = pyro.param("guide_probs_a")
        probs_c = pyro.param("guide_probs_c")
        a = pyro.sample(
            "a", dist.Categorical(probs_a), infer={"enumerate": "parallel"}
        )
        for i in pyro.plate("data", 2):
            pyro.sample(f"c_{i}", dist.Categorical(probs_c[a]))

    data = jnp.asarray([0, 0])
    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), auto_model, auto_guide, data
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, hand_guide, data
    )
    _check_loss_and_grads(hand, auto, skip={"guide_probs_c"})


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plates_1(scale):
    #  +-----------------+
    #  | a ----> b   M=2 |
    #  +-----------------+
    #  +-----------------+
    #  | c ----> d   N=3 |
    #  +-----------------+
    # two unrelated plates; each should remain uncontracted
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.45, 0.55])
    _simplex_param("probs_b", [[0.6, 0.4], [0.4, 0.6]])
    _simplex_param("probs_c", [0.75, 0.25])
    _simplex_param("probs_d", [[0.4, 0.6], [0.3, 0.7]])
    b_data = jnp.asarray([0, 1])
    d_data = jnp.asarray([0, 0, 1])

    @config_enumerate
    @poutine.scale(scale=scale)
    def auto_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        probs_d = pyro.param("probs_d")
        with pyro.plate("a_axis", 2):
            a = pyro.sample("a", dist.Categorical(probs_a))
            pyro.sample("b", dist.Categorical(probs_b[a]), obs=b_data)
        with pyro.plate("c_axis", 3):
            c = pyro.sample("c", dist.Categorical(probs_c))
            pyro.sample("d", dist.Categorical(probs_d[c]), obs=d_data)

    @config_enumerate
    @poutine.scale(scale=scale)
    def hand_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        probs_d = pyro.param("probs_d")
        for i in pyro.plate("a_axis", 2):
            a = pyro.sample(f"a_{i}", dist.Categorical(probs_a))
            pyro.sample(f"b_{i}", dist.Categorical(probs_b[a]), obs=b_data[i])
        for j in pyro.plate("c_axis", 3):
            c = pyro.sample(f"c_{j}", dist.Categorical(probs_c))
            pyro.sample(f"d_{j}", dist.Categorical(probs_d[c]), obs=d_data[j])

    def guide():
        pass

    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), auto_model, guide
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, guide
    )
    _check_loss_and_grads(hand, auto)


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plates_2(scale):
    #  +---------+       +---------+
    #  |     b <---- a ----> c     |
    #  | M=2     |       |     N=3 |
    #  +---------+       +---------+
    # two different plates with recycled dimension
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.45, 0.55])
    _simplex_param("probs_b", [[0.6, 0.4], [0.4, 0.6]])
    _simplex_param("probs_c", [[0.75, 0.25], [0.55, 0.45]])
    b_data = jnp.asarray([0, 1])
    c_data = jnp.asarray([0, 0, 1])

    @config_enumerate
    @poutine.scale(scale=scale)
    def auto_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        with pyro.plate("b_axis", 2):
            pyro.sample("b", dist.Categorical(probs_b[a]), obs=b_data)
        with pyro.plate("c_axis", 3):
            pyro.sample("c", dist.Categorical(probs_c[a]), obs=c_data)

    @config_enumerate
    @poutine.scale(scale=scale)
    def hand_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        for i in pyro.plate("b_axis", 2):
            pyro.sample(f"b_{i}", dist.Categorical(probs_b[a]), obs=b_data[i])
        for j in pyro.plate("c_axis", 3):
            pyro.sample(f"c_{j}", dist.Categorical(probs_c[a]), obs=c_data[j])

    def guide():
        pass

    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), auto_model, guide
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, guide
    )
    _check_loss_and_grads(hand, auto)


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plates_3(scale):
    # multiple plate contractions in a single step (nested plates)
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.45, 0.55])
    _simplex_param("probs_b", [[0.6, 0.4], [0.4, 0.6]])
    data = jnp.asarray([[0, 1], [0, 0]])

    @config_enumerate
    @poutine.scale(scale=scale)
    def auto_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        a = pyro.sample("a", dist.Categorical(probs_a))
        with pyro.plate("outer", 2):
            with pyro.plate("inner", 2):
                pyro.sample("b", dist.Categorical(probs_b[a]), obs=data)

    @config_enumerate
    @poutine.scale(scale=scale)
    def hand_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        inner = pyro.plate("inner", 2)
        a = pyro.sample("a", dist.Categorical(probs_a))
        for i in pyro.plate("outer", 2):
            for j in inner:
                pyro.sample(
                    f"b_{i}_{j}", dist.Categorical(probs_b[a]), obs=data[i, j]
                )

    def guide():
        pass

    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=2), auto_model, guide
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, guide
    )
    _check_loss_and_grads(hand, auto)


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plates_4(scale):
    # enumerated b in the outer plate, obs in the nested inner plate
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.45, 0.55])
    _simplex_param("probs_b", [[0.6, 0.4], [0.4, 0.6]])
    _simplex_param("probs_c", [[0.4, 0.6], [0.3, 0.7]])

    @config_enumerate
    @poutine.scale(scale=scale)
    def auto_model(data):
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        with pyro.plate("outer", 2):
            b = pyro.sample("b", dist.Categorical(probs_b[a]))
            with pyro.plate("inner", 2):
                pyro.sample("c", dist.Categorical(probs_c[b]), obs=data)

    @config_enumerate
    @poutine.scale(scale=scale)
    def hand_model(data):
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        inner = pyro.plate("inner", 2)
        a = pyro.sample("a", dist.Categorical(probs_a))
        for i in pyro.plate("outer", 2):
            b = pyro.sample(f"b_{i}", dist.Categorical(probs_b[a]))
            for j in inner:
                pyro.sample(
                    f"c_{i}_{j}", dist.Categorical(probs_c[b]), obs=data[i, j]
                )

    def guide(data):
        pass

    data = jnp.asarray([[0, 1], [0, 0]])
    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=2), auto_model, guide, data
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, guide, data
    )
    _check_loss_and_grads(hand, auto)


@pytest.mark.parametrize("scale", [1, 10])
@pytest.mark.parametrize(
    "num_samples,num_masked",
    [(2, 2), (3, 2)],
    ids=["batch", "masked"],
)
def test_elbo_enumerate_plate_3(num_samples, num_masked, scale):
    #  +-----------------------+
    #  | x ----> y ----> z     |
    #  |                     N |
    #  +-----------------------+
    # All enumeration lives inside a single plate (which therefore
    # stays unreduced); the guide enumerates x inside the same plate
    # (ref test_enum.py:2121 ``test_elbo_enumerate_plate_3``).
    pyro.clear_param_store()
    _simplex_param("guide_probs_x", [0.1, 0.9])
    _simplex_param("model_probs_x", [0.4, 0.6])
    _simplex_param("model_probs_y", [[0.75, 0.25], [0.55, 0.45]])
    _simplex_param("model_probs_z", [[0.3, 0.7], [0.2, 0.8]])

    @poutine.scale(scale=scale)
    def auto_model(data):
        probs_x = pyro.param("model_probs_x")
        probs_y = pyro.param("model_probs_y")
        probs_z = pyro.param("model_probs_z")
        with pyro.plate("data", len(data)):
            with poutine.mask(mask=jnp.arange(num_samples) < num_masked):
                x = pyro.sample("x", dist.Categorical(probs_x))
                y = pyro.sample(
                    "y",
                    dist.Categorical(probs_y[x]),
                    infer={"enumerate": "parallel"},
                )
                pyro.sample("z", dist.Categorical(probs_z[y]), obs=data)

    @poutine.scale(scale=scale)
    @config_enumerate
    def auto_guide(data):
        probs_x = pyro.param("guide_probs_x")
        with pyro.plate("data", len(data)):
            with poutine.mask(mask=jnp.arange(num_samples) < num_masked):
                pyro.sample("x", dist.Categorical(probs_x))

    @poutine.scale(scale=scale)
    def hand_model(data):
        probs_x = pyro.param("model_probs_x")
        probs_y = pyro.param("model_probs_y")
        probs_z = pyro.param("model_probs_z")
        for i in pyro.plate("data", num_masked):
            x = pyro.sample(f"x_{i}", dist.Categorical(probs_x))
            y = pyro.sample(
                f"y_{i}",
                dist.Categorical(probs_y[x]),
                infer={"enumerate": "parallel"},
            )
            pyro.sample(f"z_{i}", dist.Categorical(probs_z[y]), obs=data[i])

    @poutine.scale(scale=scale)
    @config_enumerate
    def hand_guide(data):
        probs_x = pyro.param("guide_probs_x")
        for i in pyro.plate("data", num_masked):
            pyro.sample(f"x_{i}", dist.Categorical(probs_x))

    data = dist.Categorical(jnp.asarray([0.3, 0.7])).sample(
        jax.random.key(1), (num_samples,)
    )
    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), auto_model, auto_guide, data
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, hand_guide, data
    )
    _check_loss_and_grads(hand, auto)


def test_elbo_enumerate_plate_5_error():
    #        Guide   Model
    #                  a
    #  +---------------|--+
    #  | M=2           V  |
    #  |       b ----> c  |
    #  +------------------+
    # Model enumeration (a, global) more global than guide enumeration
    # (b, in-plate) must raise, matching the reference's semantics
    # (ref test_enum.py:2274 ``test_elbo_enumerate_plate_5``).
    pyro.clear_param_store()
    _simplex_param("model_probs_a", [0.45, 0.55])
    _simplex_param("model_probs_b", [0.6, 0.4])
    _simplex_param(
        "model_probs_c",
        [[[0.4, 0.5, 0.1], [0.3, 0.5, 0.2]], [[0.3, 0.4, 0.3], [0.4, 0.4, 0.2]]],
    )
    _simplex_param("guide_probs_b", [0.8, 0.2])
    data = jnp.asarray([1, 2])

    @config_enumerate
    def model_plate():
        probs_a = pyro.param("model_probs_a")
        probs_b = pyro.param("model_probs_b")
        probs_c = pyro.param("model_probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        with pyro.plate("b_axis", 2):
            b = pyro.sample("b", dist.Categorical(probs_b))
            pyro.sample("c", dist.Categorical(Vindex(probs_c)[a, b]), obs=data)

    @config_enumerate
    def guide_plate():
        probs_b = pyro.param("guide_probs_b")
        with pyro.plate("b_axis", 2):
            pyro.sample("b", dist.Categorical(probs_b))

    @config_enumerate
    def model_iplate():
        probs_a = pyro.param("model_probs_a")
        probs_b = pyro.param("model_probs_b")
        probs_c = pyro.param("model_probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        for i in pyro.plate("b_axis", 2):
            b = pyro.sample(f"b_{i}", dist.Categorical(probs_b))
            pyro.sample(
                f"c_{i}", dist.Categorical(Vindex(probs_c)[a, b]), obs=data[i]
            )

    @config_enumerate
    def guide_iplate():
        probs_b = pyro.param("guide_probs_b")
        for i in pyro.plate("b_axis", 2):
            pyro.sample(f"b_{i}", dist.Categorical(probs_b))

    # the sequential version is well-defined ...
    _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), model_iplate, guide_iplate
    )
    # ... but the vectorized promotion is ill-posed and must raise
    with pytest.raises(
        ValueError,
        match="Expected model enumeration to be no more global than guide",
    ):
        _loss_and_grads(
            TraceEnum_ELBO(max_plate_nesting=1), model_plate, guide_plate
        )


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plates_5(scale):
    #     a
    #     | \
    #  +--|---\------------+
    #  |  V   +-\--------+ |
    #  |  b ----> c      | |
    #  |      |      N=2 | |
    #  | M=2  +----------+ |
    #  +-------------------+
    # Joint Vindex dependence of the inner obs on (global a, outer b)
    # (ref test_enum.py:2739 ``test_elbo_enumerate_plates_5``).
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.45, 0.55])
    _simplex_param("probs_b", [[0.6, 0.4], [0.4, 0.6]])
    _simplex_param(
        "probs_c", [[[0.4, 0.6], [0.3, 0.7]], [[0.2, 0.8], [0.1, 0.9]]]
    )
    data = jnp.asarray([[0, 1], [0, 0]])

    @config_enumerate
    @poutine.scale(scale=scale)
    def auto_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        a = pyro.sample("a", dist.Categorical(probs_a))
        with pyro.plate("outer", 2):
            b = pyro.sample("b", dist.Categorical(probs_b[a]))
            with pyro.plate("inner", 2):
                pyro.sample(
                    "c", dist.Categorical(Vindex(probs_c)[a, b]), obs=data
                )

    @config_enumerate
    @poutine.scale(scale=scale)
    def hand_model():
        probs_a = pyro.param("probs_a")
        probs_b = pyro.param("probs_b")
        probs_c = pyro.param("probs_c")
        inner = pyro.plate("inner", 2)
        a = pyro.sample("a", dist.Categorical(probs_a))
        for i in pyro.plate("outer", 2):
            b = pyro.sample(f"b_{i}", dist.Categorical(probs_b[a]))
            for j in inner:
                pyro.sample(
                    f"c_{i}_{j}",
                    dist.Categorical(Vindex(probs_c)[a, b]),
                    obs=data[i, j],
                )

    def guide():
        pass

    auto = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=2), auto_model, guide
    )
    hand = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), hand_model, guide
    )
    _check_loss_and_grads(hand, auto)


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plates_6(scale):
    #         +----------+
    #         |      M=2 |
    #     a ----> b      |
    #     |   |   |      |
    #  +--|-------|--+   |
    #  |  V   |   V  |   |
    #  |  c ----> d  |   |
    #  |      |      |   |
    #  | N=2  +------|---+
    #  +-------------+
    # Mixing two independence contexts: either sequential plate can be
    # promoted to vectorized alone, but promoting BOTH creates a
    # non-tree plate nesting with enumerated variables inside, which
    # must raise (ref test_enum.py:2801 ``test_elbo_enumerate_plates_6``).
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.45, 0.55])
    _simplex_param("probs_b", [[0.6, 0.4], [0.4, 0.6]])
    _simplex_param("probs_c", [[0.75, 0.25], [0.55, 0.45]])
    _simplex_param(
        "probs_d", [[[0.4, 0.6], [0.3, 0.7]], [[0.3, 0.7], [0.2, 0.8]]]
    )
    data = jnp.asarray([[0, 1], [0, 0]])

    def P(name):
        return pyro.param(name)

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_iplate_iplate(data):
        b_axis = pyro.plate("b_axis", 2)
        c_axis = pyro.plate("c_axis", 2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        b = [
            pyro.sample(f"b_{i}", dist.Categorical(P("probs_b")[a]))
            for i in b_axis
        ]
        c = [
            pyro.sample(f"c_{j}", dist.Categorical(P("probs_c")[a]))
            for j in c_axis
        ]
        for i in b_axis:
            for j in c_axis:
                pyro.sample(
                    f"d_{i}_{j}",
                    dist.Categorical(Vindex(P("probs_d"))[b[i], c[j]]),
                    obs=data[i, j],
                )

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_iplate_plate(data):
        b_axis = pyro.plate("b_axis", 2)
        c_axis = pyro.plate("c_axis", 2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        b = [
            pyro.sample(f"b_{i}", dist.Categorical(P("probs_b")[a]))
            for i in b_axis
        ]
        with c_axis:
            c = pyro.sample("c", dist.Categorical(P("probs_c")[a]))
        for i in b_axis:
            with c_axis:
                pyro.sample(
                    f"d_{i}",
                    dist.Categorical(Vindex(P("probs_d"))[b[i], c]),
                    obs=data[i],
                )

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_plate_iplate(data):
        b_axis = pyro.plate("b_axis", 2)
        c_axis = pyro.plate("c_axis", 2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        with b_axis:
            b = pyro.sample("b", dist.Categorical(P("probs_b")[a]))
        c = [
            pyro.sample(f"c_{j}", dist.Categorical(P("probs_c")[a]))
            for j in c_axis
        ]
        with b_axis:
            for j in c_axis:
                pyro.sample(
                    f"d_{j}",
                    dist.Categorical(Vindex(P("probs_d"))[b, c[j]]),
                    obs=data[:, j],
                )

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_plate_plate(data):
        b_axis = pyro.plate("b_axis", 2, dim=-1)
        c_axis = pyro.plate("c_axis", 2, dim=-2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        with b_axis:
            b = pyro.sample("b", dist.Categorical(P("probs_b")[a]))
        with c_axis:
            c = pyro.sample("c", dist.Categorical(P("probs_c")[a]))
        with b_axis, c_axis:
            pyro.sample(
                "d", dist.Categorical(Vindex(P("probs_d"))[b, c]), obs=data
            )

    def guide(data):
        pass

    ii = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), model_iplate_iplate, guide, data
    )
    pi = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), model_plate_iplate, guide, data
    )
    ip = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), model_iplate_plate, guide, data
    )
    _check_loss_and_grads(ii, pi)
    _check_loss_and_grads(ii, ip)

    with pytest.raises(
        NotImplementedError, match="Expected tree-structured plate nesting"
    ):
        _loss_and_grads(
            TraceEnum_ELBO(max_plate_nesting=2),
            model_plate_plate,
            guide,
            data,
        )


@pytest.mark.parametrize("scale", [1, 10])
def test_elbo_enumerate_plates_7(scale):
    #         +-------------+
    #         |         N=2 |
    #     a -------> c      |
    #     |   |      |      |
    #  +--|----------|--+   |
    #  |  |   |      V  |   |
    #  |  V   |      e  |   |
    #  |  b ----> d     |   |
    #  |      |         |   |
    #  | M=2  +---------|---+
    #  +----------------+
    # Tree-structured VARIABLE dependencies over non-tree PLATE
    # nestings: every promotion combination (including both plates
    # vectorized) is well-posed and must agree
    # (ref test_enum.py:2940 ``test_elbo_enumerate_plates_7``).
    pyro.clear_param_store()
    _simplex_param("probs_a", [0.45, 0.55])
    _simplex_param("probs_b", [[0.6, 0.4], [0.4, 0.6]])
    _simplex_param("probs_c", [[0.75, 0.25], [0.55, 0.45]])
    _simplex_param("probs_d", [[0.3, 0.7], [0.2, 0.8]])
    _simplex_param("probs_e", [[0.4, 0.6], [0.3, 0.7]])
    data = jnp.asarray([[0, 1], [0, 0]])

    def P(name):
        return pyro.param(name)

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_iplate_iplate(data):
        b_axis = pyro.plate("b_axis", 2)
        c_axis = pyro.plate("c_axis", 2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        b = [
            pyro.sample(f"b_{i}", dist.Categorical(P("probs_b")[a]))
            for i in b_axis
        ]
        c = [
            pyro.sample(f"c_{j}", dist.Categorical(P("probs_c")[a]))
            for j in c_axis
        ]
        for i in b_axis:
            for j in c_axis:
                pyro.sample(
                    f"d_{i}_{j}",
                    dist.Categorical(P("probs_d")[b[i]]),
                    obs=data[i, j],
                )
                pyro.sample(
                    f"e_{i}_{j}",
                    dist.Categorical(P("probs_e")[c[j]]),
                    obs=data[i, j],
                )

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_iplate_plate(data):
        b_axis = pyro.plate("b_axis", 2)
        c_axis = pyro.plate("c_axis", 2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        b = [
            pyro.sample(f"b_{i}", dist.Categorical(P("probs_b")[a]))
            for i in b_axis
        ]
        with c_axis:
            c = pyro.sample("c", dist.Categorical(P("probs_c")[a]))
        for i in b_axis:
            with c_axis:
                pyro.sample(
                    f"d_{i}", dist.Categorical(P("probs_d")[b[i]]), obs=data[i]
                )
                pyro.sample(
                    f"e_{i}", dist.Categorical(P("probs_e")[c]), obs=data[i]
                )

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_plate_iplate(data):
        b_axis = pyro.plate("b_axis", 2)
        c_axis = pyro.plate("c_axis", 2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        with b_axis:
            b = pyro.sample("b", dist.Categorical(P("probs_b")[a]))
        c = [
            pyro.sample(f"c_{j}", dist.Categorical(P("probs_c")[a]))
            for j in c_axis
        ]
        with b_axis:
            for j in c_axis:
                pyro.sample(
                    f"d_{j}", dist.Categorical(P("probs_d")[b]), obs=data[:, j]
                )
                pyro.sample(
                    f"e_{j}",
                    dist.Categorical(P("probs_e")[c[j]]),
                    obs=data[:, j],
                )

    @config_enumerate
    @poutine.scale(scale=scale)
    def model_plate_plate(data):
        b_axis = pyro.plate("b_axis", 2, dim=-1)
        c_axis = pyro.plate("c_axis", 2, dim=-2)
        a = pyro.sample("a", dist.Categorical(P("probs_a")))
        with b_axis:
            b = pyro.sample("b", dist.Categorical(P("probs_b")[a]))
        with c_axis:
            c = pyro.sample("c", dist.Categorical(P("probs_c")[a]))
        with b_axis, c_axis:
            pyro.sample("d", dist.Categorical(P("probs_d")[b]), obs=data)
            pyro.sample("e", dist.Categorical(P("probs_e")[c]), obs=data)

    def guide(data):
        pass

    ii = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0), model_iplate_iplate, guide, data
    )
    pi = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), model_plate_iplate, guide, data
    )
    ip = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=1), model_iplate_plate, guide, data
    )
    pp = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=2), model_plate_plate, guide, data
    )
    _check_loss_and_grads(ii, pi)
    _check_loss_and_grads(ii, ip)
    _check_loss_and_grads(ii, pp)


@pytest.mark.parametrize(
    "outer_vectorized,inner_vectorized,raises",
    [(False, True, False), (True, False, True), (True, True, True)],
    ids=["iplate-plate", "plate-iplate", "plate-plate"],
)
def test_elbo_enumerate_plates_8(inner_vectorized, outer_vectorized, raises):
    #        Guide   Model
    #                  a
    #      +-----------|--------+
    #      | M=2   +---|------+ |
    #      |       |   V  N=2 | |
    #      |   b ----> c      | |
    #      |       +----------+ |
    #      +--------------------+
    # Guide-side enumeration inside the outer plate: vectorizing the
    # INNER (model-only) plate is fine, but vectorizing the outer
    # plate makes the globally-enumerated model site `a` more global
    # than the guide's in-plate `b` and must raise
    # (ref test_enum.py:3097 ``test_elbo_enumerate_plates_8``).
    pyro.clear_param_store()
    _simplex_param("model_probs_a", [0.45, 0.55])
    _simplex_param("model_probs_b", [0.6, 0.4])
    _simplex_param(
        "model_probs_c",
        [[[0.4, 0.5, 0.1], [0.3, 0.5, 0.2]], [[0.3, 0.4, 0.3], [0.4, 0.4, 0.2]]],
    )
    _simplex_param("guide_probs_b", [0.8, 0.2])
    data = jnp.asarray([[0, 1], [0, 2]])

    def P(name):
        return pyro.param(name)

    @config_enumerate
    def model_plate_plate():
        a = pyro.sample("a", dist.Categorical(P("model_probs_a")))
        with pyro.plate("outer", 2):
            b = pyro.sample("b", dist.Categorical(P("model_probs_b")))
            with pyro.plate("inner", 2):
                pyro.sample(
                    "c",
                    dist.Categorical(Vindex(P("model_probs_c"))[a, b]),
                    obs=data,
                )

    @config_enumerate
    def model_iplate_plate():
        inner = pyro.plate("inner", 2)
        a = pyro.sample("a", dist.Categorical(P("model_probs_a")))
        for i in pyro.plate("outer", 2):
            b = pyro.sample(f"b_{i}", dist.Categorical(P("model_probs_b")))
            with inner:
                pyro.sample(
                    f"c_{i}",
                    dist.Categorical(Vindex(P("model_probs_c"))[a, b]),
                    obs=data[:, i],
                )

    @config_enumerate
    def model_plate_iplate():
        a = pyro.sample("a", dist.Categorical(P("model_probs_a")))
        with pyro.plate("outer", 2):
            b = pyro.sample("b", dist.Categorical(P("model_probs_b")))
            for j in pyro.plate("inner", 2):
                pyro.sample(
                    f"c_{j}",
                    dist.Categorical(Vindex(P("model_probs_c"))[a, b]),
                    obs=data[j],
                )

    @config_enumerate
    def model_iplate_iplate():
        inner = pyro.plate("inner", 2)
        a = pyro.sample("a", dist.Categorical(P("model_probs_a")))
        for i in pyro.plate("outer", 2):
            b = pyro.sample(f"b_{i}", dist.Categorical(P("model_probs_b")))
            for j in inner:
                pyro.sample(
                    f"c_{i}_{j}",
                    dist.Categorical(Vindex(P("model_probs_c"))[a, b]),
                    obs=data[j, i],
                )

    @config_enumerate
    def guide_plate():
        with pyro.plate("outer", 2):
            pyro.sample("b", dist.Categorical(P("guide_probs_b")))

    @config_enumerate
    def guide_iplate():
        for i in pyro.plate("outer", 2):
            pyro.sample(f"b_{i}", dist.Categorical(P("guide_probs_b")))

    expected = _loss_and_grads(
        TraceEnum_ELBO(max_plate_nesting=0),
        model_iplate_iplate,
        guide_iplate,
    )
    if inner_vectorized and outer_vectorized:
        run = lambda: _loss_and_grads(
            TraceEnum_ELBO(max_plate_nesting=2),
            model_plate_plate,
            guide_plate,
        )
    elif inner_vectorized:
        run = lambda: _loss_and_grads(
            TraceEnum_ELBO(max_plate_nesting=1),
            model_iplate_plate,
            guide_iplate,
        )
    else:
        run = lambda: _loss_and_grads(
            TraceEnum_ELBO(max_plate_nesting=1),
            model_plate_iplate,
            guide_plate,
        )
    if raises:
        with pytest.raises(
            ValueError,
            match="Expected model enumeration to be no more global than guide",
        ):
            run()
    else:
        _check_loss_and_grads(expected, run())
