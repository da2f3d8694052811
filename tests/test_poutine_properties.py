"""Algebraic properties of effect handlers.

Port of ``/root/reference/tests/poutine/test_properties.py``: handlers are
idempotent (``p(p(f)) == p(f)`` for block/replay/trace) and commute where
the reference asserts they do (trace with condition/do/replay).
"""

import jax.numpy as jnp
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine

EXAMPLE_MODELS = []
EXAMPLE_MODEL_IDS = []


class ExampleModel:
    def __init__(self, fn, poutine_kwargs):
        self.fn = fn
        self.poutine_kwargs = poutine_kwargs

    def __call__(self, *args, **kwargs):
        return self.fn(*args, **kwargs)

    def bind_poutine(self, poutine_name):
        p = getattr(poutine, poutine_name)
        kwargs = self.poutine_kwargs.get(poutine_name, {})
        return lambda fn: p(fn, **kwargs)


def register_model(**poutine_kwargs):
    def register_fn(fn):
        model = ExampleModel(fn, poutine_kwargs)
        EXAMPLE_MODELS.append(model)
        EXAMPLE_MODEL_IDS.append(model.fn.__name__)
        return model

    return register_fn


@register_model(
    replay={"trace": poutine.Trace()},
    block={},
    condition={"data": {}},
    do={"data": {}},
)
def trivial_model():
    return []


tr_normal = poutine.Trace()
tr_normal.add_node(
    "normal_0", type="sample", is_observed=False, value=jnp.zeros(1), infer={}
)


@register_model(
    replay={"trace": tr_normal},
    block={"hide": ["normal_0"]},
    condition={"data": {"normal_0": jnp.zeros(1)}},
    do={"data": {"normal_0": jnp.zeros(1)}},
)
def normal_model():
    normal_0 = pyro.sample("normal_0", dist.Normal(jnp.zeros(1), jnp.ones(1)))
    return [normal_0]


tr_normal_normal = poutine.Trace()
tr_normal_normal.add_node(
    "normal_0", type="sample", is_observed=False, value=jnp.zeros(1), infer={}
)


@register_model(
    replay={"trace": tr_normal_normal},
    block={"hide": ["normal_0"]},
    condition={"data": {"normal_0": jnp.zeros(1)}},
    do={"data": {"normal_0": jnp.zeros(1)}},
)
def normal_normal_model():
    normal_0 = pyro.sample("normal_0", dist.Normal(jnp.zeros(1), jnp.ones(1)))
    normal_1 = jnp.ones(1)
    pyro.sample("normal_1", dist.Normal(normal_0, jnp.ones(1)), obs=normal_1)
    return [normal_0, normal_1]


tr_bernoulli_normal = poutine.Trace()
tr_bernoulli_normal.add_node(
    "bern_0", type="sample", is_observed=False, value=jnp.ones(1), infer={}
)


@register_model(
    replay={"trace": tr_bernoulli_normal},
    block={"hide": ["bern_0"]},
    condition={"data": {"bern_0": jnp.ones(1)}},
    do={"data": {"bern_0": jnp.ones(1)}},
)
def bernoulli_normal_model():
    bern_0 = pyro.sample("bern_0", dist.Bernoulli(jnp.zeros(1) + 1e-2))
    loc = jnp.where(bern_0 > 0.5, jnp.ones(1), -jnp.ones(1))
    normal_0 = jnp.ones(1)
    pyro.sample("normal_0", dist.Normal(loc, jnp.ones(1) * 1e-2), obs=normal_0)
    return [bern_0, normal_0]


def get_trace(fn, *args, **kwargs):
    pyro.set_rng_seed(123)
    return poutine.trace(fn).get_trace(*args, **kwargs)


def assert_traces_equal(actual, expected):
    assert set(actual.nodes) == set(expected.nodes)
    for name, site in expected.nodes.items():
        a = actual.nodes[name]
        assert a["type"] == site["type"], name
        if site["type"] != "sample":
            continue
        assert bool(a["is_observed"]) == bool(site["is_observed"]), name
        assert jnp.shape(a["value"]) == jnp.shape(site["value"]), name
        assert jnp.allclose(a["value"], site["value"]), name


@pytest.mark.parametrize("model", EXAMPLE_MODELS, ids=EXAMPLE_MODEL_IDS)
@pytest.mark.parametrize("poutine_name", ["block", "replay", "trace"])
def test_idempotent(poutine_name, model):
    p = model.bind_poutine(poutine_name)
    expected_trace = get_trace(p(model))
    actual_trace = get_trace(p(p(model)))
    assert_traces_equal(actual_trace, expected_trace)


@pytest.mark.parametrize("model", EXAMPLE_MODELS, ids=EXAMPLE_MODEL_IDS)
@pytest.mark.parametrize(
    "p1_name,p2_name",
    [("trace", "condition"), ("trace", "do"), ("trace", "replay")],
)
def test_commutes(p1_name, p2_name, model):
    p1 = model.bind_poutine(p1_name)
    p2 = model.bind_poutine(p2_name)
    expected_trace = get_trace(p1(p2(model)))
    actual_trace = get_trace(p2(p1(model)))
    assert_traces_equal(actual_trace, expected_trace)
