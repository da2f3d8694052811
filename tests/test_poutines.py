"""Handler-behavior suite over a Normal-Normal-Normal model.

Mirrors the reference's ``tests/poutine/test_poutines.py``: trace
structure, replay, the full block matrix (hide/expose x fn/list/partial),
queue-based sequential enumeration, lift, substitute/condition stack
behavior, uncondition, escape + NonlocalExit composition, infer_config,
equalize, decorator interfaces, and error messages.
"""

import functools
from queue import Queue

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.poutine import NonlocalExit, Trace
from pyro_tpu.poutine.util import all_escape, discrete_escape


@pytest.fixture
def model_guide():
    pyro.clear_param_store()

    def model():
        latent1 = pyro.sample(
            "latent1", dist.Normal(jnp.zeros(2), jnp.ones(2))
        )
        latent2 = pyro.sample(
            "latent2", dist.Normal(latent1, 5 * jnp.ones(2))
        )
        pyro.sample("obs", dist.Normal(latent2, jnp.ones(2)), obs=jnp.ones(2))
        return latent1

    def guide():
        loc1 = pyro.param("loc1", jnp.zeros(2))
        scale1 = pyro.param("scale1", jnp.ones(2))
        pyro.sample("latent1", dist.Normal(loc1, scale1))
        loc2 = pyro.param("loc2", jnp.zeros(2))
        scale2 = pyro.param("scale2", jnp.ones(2))
        return pyro.sample("latent2", dist.Normal(loc2, scale2))

    return model, guide


MODEL_SITES = ["latent1", "latent2", "obs", "_INPUT", "_RETURN"]
GUIDE_SITES = [
    "latent1", "latent2", "loc1", "scale1", "loc2", "scale2",
    "_INPUT", "_RETURN",
]


def _seeded(fn, s=0):
    return poutine.seed(fn, rng_key=jax.random.key(s))


# -- trace ------------------------------------------------------------------


def test_trace_full(model_guide):
    model, guide = model_guide
    for fn, sites in [(model, MODEL_SITES), (guide, GUIDE_SITES)]:
        tr = poutine.trace(_seeded(fn)).get_trace()
        assert set(tr.nodes) == set(sites)

def test_trace_return(model_guide):
    model, _ = model_guide
    tr = poutine.trace(_seeded(model)).get_trace()
    assert np.allclose(
        np.asarray(tr.nodes["latent1"]["value"]),
        np.asarray(tr.nodes["_RETURN"]["value"]),
    )


# -- replay -----------------------------------------------------------------


def test_replay_full(model_guide):
    model, guide = model_guide
    guide_trace = poutine.trace(_seeded(guide, 1)).get_trace()
    model_trace = poutine.trace(
        poutine.replay(_seeded(model, 2), trace=guide_trace)
    ).get_trace()
    for name in ("latent1", "latent2"):
        assert np.allclose(
            np.asarray(model_trace.nodes[name]["value"]),
            np.asarray(guide_trace.nodes[name]["value"]),
        )


def test_replay_full_repeat(model_guide):
    """Replaying twice against the same trace gives identical values."""
    model, guide = model_guide
    guide_trace = poutine.trace(_seeded(guide, 1)).get_trace()
    ftr = poutine.trace(
        poutine.replay(_seeded(model, 2), trace=guide_trace)
    )
    tr1 = ftr.get_trace()
    tr2 = ftr.get_trace()
    for name in ("latent1", "latent2"):
        assert np.allclose(
            np.asarray(tr1.nodes[name]["value"]),
            np.asarray(tr2.nodes[name]["value"]),
        )


# -- block ------------------------------------------------------------------


def _traced_names(fn):
    tr = poutine.trace(_seeded(fn)).get_trace()
    return {
        name
        for name, site in tr.nodes.items()
        if site["type"] in ("sample", "param")
    }


def test_block_full(model_guide):
    model, guide = model_guide
    assert _traced_names(poutine.block(model)) == set()
    assert _traced_names(poutine.block(guide)) == set()


def test_block_full_hide(model_guide):
    model, _ = model_guide
    names = _traced_names(
        poutine.block(model, hide=["latent1", "latent2", "obs"])
    )
    assert names == set()


def test_block_full_expose(model_guide):
    model, _ = model_guide
    names = _traced_names(
        poutine.block(model, expose=["latent1", "latent2", "obs"])
    )
    assert names == {"latent1", "latent2", "obs"}


def test_block_partial_hide(model_guide):
    model, _ = model_guide
    names = _traced_names(poutine.block(model, hide=["latent1"]))
    assert "latent1" not in names and "latent2" in names


def test_block_partial_expose(model_guide):
    model, _ = model_guide
    names = _traced_names(poutine.block(model, expose=["latent1"]))
    assert names == {"latent1"}


def test_block_hide_fn(model_guide):
    model, _ = model_guide
    names = _traced_names(
        poutine.block(model, hide_fn=lambda m: "latent" in m["name"])
    )
    assert names == {"obs"}


def test_block_expose_fn(model_guide):
    model, _ = model_guide
    names = _traced_names(
        poutine.block(model, expose_fn=lambda m: "latent" in m["name"])
    )
    assert names == {"latent1", "latent2"}


def test_block_hide_types(model_guide):
    _, guide = model_guide
    names = _traced_names(poutine.block(guide, hide_types=["param"]))
    assert names == {"latent1", "latent2"}


def test_block_expose_types(model_guide):
    _, guide = model_guide
    names = _traced_names(poutine.block(guide, expose_types=["param"]))
    assert names == {"loc1", "scale1", "loc2", "scale2"}


def test_block_tutorial_case(model_guide):
    """Block hides sites from an OUTER trace but not an inner one
    (ref test_poutines.py:224)."""
    model, _ = model_guide
    inner = poutine.trace(_seeded(model))
    outer = poutine.trace(poutine.block(inner, hide=["latent1"]))
    tr_outer = outer.get_trace()
    assert "latent1" not in tr_outer.nodes
    tr_inner = inner.msngr.get_trace()
    assert "latent1" in tr_inner.nodes


def test_block_class_method():
    """Blocking a bound method works (ref test_poutines.py:1106)."""

    class Thing:
        def model(self):
            return pyro.sample("x", dist.Normal(0.0, 1.0))

    thing = Thing()
    tr = poutine.trace(
        poutine.block(_seeded(thing.model), expose=["x"])
    ).get_trace()
    assert "x" in tr.nodes


# -- queue ------------------------------------------------------------------


@pytest.fixture
def discrete_hmm():
    pyro.clear_param_store()

    def model():
        probs = pyro.param("probs", jnp.asarray([[0.8], [0.3]]))
        loc = pyro.param("loc", jnp.asarray([[-0.1], [0.9]]))
        latents = [jnp.ones(1)]
        for t in range(3):
            idx = int(np.asarray(latents[-1][0]))
            latents.append(
                pyro.sample(f"latent_{t}", dist.Bernoulli(probs[idx]))
            )
            pyro.sample(
                f"observe_{t}",
                dist.Normal(loc[int(np.asarray(latents[-1][0]))], jnp.ones(1)),
                obs=jnp.ones(1),
            )
        return latents

    return model


def test_queue_single(discrete_hmm):
    q = Queue()
    q.put(Trace())
    f = poutine.trace(poutine.queue(discrete_hmm, queue=q))
    tr = f.get_trace()
    for t in range(3):
        assert f"latent_{t}" in tr.nodes and f"observe_{t}" in tr.nodes


def test_queue_enumerate(discrete_hmm):
    q = Queue()
    q.put(Trace())
    f = poutine.trace(poutine.queue(discrete_hmm, queue=q))
    trs = []
    while not q.empty():
        trs.append(f.get_trace())
    assert len(trs) == 2**3
    tr_latents = {
        tuple(
            int(np.asarray(tr.nodes[f"latent_{t}"]["value"]).reshape(-1)[0])
            for t in range(3)
        )
        for tr in trs
    }
    assert tr_latents == {
        (a, b, c) for a in range(2) for b in range(2) for c in range(2)
    }


def test_queue_max_tries(discrete_hmm):
    q = Queue()
    q.put(Trace())
    f = poutine.queue(discrete_hmm, queue=q, max_tries=3)
    with pytest.raises(ValueError):
        f()


# -- lift -------------------------------------------------------------------


def test_lift_prior_dict(model_guide):
    _, guide = model_guide
    prior = {
        "loc1": dist.Normal(0.0, 1.0),
        "scale1": dist.LogNormal(0.0, 1.0),
        "loc2": dist.Normal(0.0, 1.0),
        "scale2": dist.LogNormal(0.0, 1.0),
    }
    tr = poutine.trace(
        _seeded(poutine.lift(guide, prior=prior))
    ).get_trace()
    for name in ("loc1", "scale1", "loc2", "scale2"):
        assert tr.nodes[name]["type"] == "sample"
        assert not tr.nodes[name]["is_observed"]


def test_lift_unlifted_param(model_guide):
    """Params not named in the prior dict stay params
    (ref test_poutines.py:413)."""
    _, guide = model_guide
    prior = {"loc1": dist.Normal(0.0, 1.0)}
    tr = poutine.trace(
        _seeded(poutine.lift(guide, prior=prior))
    ).get_trace()
    assert tr.nodes["loc1"]["type"] == "sample"
    assert tr.nodes["scale1"]["type"] == "param"


def test_lift_single_dist(model_guide):
    _, guide = model_guide
    tr = poutine.trace(
        _seeded(poutine.lift(guide, prior=dist.Normal(0.0, 1.0)))
    ).get_trace()
    for name in ("loc1", "scale1", "loc2", "scale2"):
        assert tr.nodes[name]["type"] == "sample"


# -- substitute / condition stack behavior ----------------------------------


def test_substitute(model_guide):
    """Substitute sets PARAM values (ref test_poutines.py:576)."""
    _, guide = model_guide
    data = {"loc1": jnp.asarray([7.0, 7.0])}
    tr = poutine.trace(
        poutine.substitute(_seeded(guide), data=data)
    ).get_trace()
    assert tr.nodes["loc1"]["type"] == "param"
    assert np.allclose(np.asarray(tr.nodes["loc1"]["value"]), 7.0)


def test_substitute_stack_success(model_guide):
    _, guide = model_guide
    data1 = {"loc1": jnp.asarray([7.0, 7.0])}
    data2 = {"loc2": jnp.asarray([9.0, 9.0])}
    tr = poutine.trace(
        poutine.substitute(
            poutine.substitute(_seeded(guide), data=data1), data=data2
        )
    ).get_trace()
    assert np.allclose(np.asarray(tr.nodes["loc1"]["value"]), 7.0)
    assert np.allclose(np.asarray(tr.nodes["loc2"]["value"]), 9.0)


def test_condition(model_guide):
    model, _ = model_guide
    data = {"latent2": jnp.asarray([5.0, 5.0])}
    tr = poutine.trace(
        poutine.condition(_seeded(model), data=data)
    ).get_trace()
    assert np.allclose(np.asarray(tr.nodes["latent2"]["value"]), 5.0)
    assert tr.nodes["latent2"]["is_observed"]


def test_condition_outermost_wins(model_guide):
    """Stacked conditions on the same site: the OUTER handler processes
    the message last and overwrites (ref test_poutines.py:627)."""
    model, _ = model_guide
    inner = poutine.condition(
        _seeded(model), data={"latent2": jnp.asarray([2.0, 2.0])}
    )
    outer = poutine.condition(
        inner, data={"latent2": jnp.asarray([3.0, 3.0])}
    )
    tr = poutine.trace(outer).get_trace()
    assert np.allclose(np.asarray(tr.nodes["latent2"]["value"]), 3.0)


def test_condition_stack_success(model_guide):
    model, _ = model_guide
    tr = poutine.trace(
        poutine.condition(
            poutine.condition(
                _seeded(model), data={"latent1": jnp.asarray([1.5, 1.5])}
            ),
            data={"latent2": jnp.asarray([2.5, 2.5])},
        )
    ).get_trace()
    for name, v in [("latent1", 1.5), ("latent2", 2.5)]:
        assert tr.nodes[name]["is_observed"]
        assert np.allclose(np.asarray(tr.nodes[name]["value"]), v)


def test_do_severs(model_guide):
    model, _ = model_guide
    data = {"latent2": jnp.asarray([4.0, 4.0])}
    tr = poutine.trace(poutine.do(_seeded(model), data=data)).get_trace()
    # do() removes the site from the trace entirely (intervention)
    assert "latent2" not in tr.nodes or not tr.nodes["latent2"].get(
        "is_observed", False
    )


# -- uncondition ------------------------------------------------------------


def test_uncondition(model_guide):
    model, _ = model_guide
    tr = poutine.trace(
        poutine.uncondition(_seeded(model))
    ).get_trace()
    assert not tr.nodes["obs"]["is_observed"]


def test_undo_uncondition(model_guide):
    model, _ = model_guide
    obs = jnp.asarray([0.5, 0.5])
    tr = poutine.trace(
        poutine.condition(
            poutine.uncondition(_seeded(model)), data={"obs": obs}
        )
    ).get_trace()
    assert np.allclose(np.asarray(tr.nodes["obs"]["value"]), 0.5)


# -- escape -----------------------------------------------------------------


@pytest.fixture
def mixed_model():
    def model():
        x = pyro.sample("x", dist.Normal(0.0, 1.0))
        y = pyro.sample("y", dist.Bernoulli(0.5))
        z = pyro.sample("z", dist.Normal(0.0, 1.0))
        return dict(x=x, y=y, z=z)

    return model


def test_discrete_escape(mixed_model):
    with pytest.raises(NonlocalExit) as exc_info:
        poutine.escape(
            _seeded(mixed_model),
            escape_fn=functools.partial(discrete_escape, Trace()),
        )()
    assert exc_info.value.site["name"] == "y"


def test_all_escape(mixed_model):
    with pytest.raises(NonlocalExit) as exc_info:
        poutine.escape(
            _seeded(mixed_model),
            escape_fn=functools.partial(all_escape, Trace()),
        )()
    assert exc_info.value.site["name"] == "x"


def test_trace_compose(mixed_model):
    """Trace inside escape records the escaping site; escape inside
    trace does not (ref test_poutines.py:707)."""
    tm = poutine.trace(_seeded(mixed_model))
    with pytest.raises(NonlocalExit):
        poutine.escape(
            tm, escape_fn=functools.partial(all_escape, Trace())
        )()
    assert "x" in tm.msngr.get_trace().nodes

    tem = poutine.trace(
        poutine.escape(
            _seeded(mixed_model),
            escape_fn=functools.partial(all_escape, Trace()),
        )
    )
    with pytest.raises(NonlocalExit):
        tem()
    assert "x" not in tem.msngr.get_trace().nodes


# -- infer_config -----------------------------------------------------------


def test_infer_config_sample():
    def model():
        pyro.param("p", jnp.zeros(1))
        pyro.sample(
            "a", dist.Bernoulli(0.5), infer={"enumerate": "parallel"}
        )
        pyro.sample("b", dist.Bernoulli(0.5))

    def config_fn(site):
        return {"blah": True} if site["type"] == "sample" else {}

    tr = poutine.trace(
        _seeded(poutine.infer_config(model, config_fn=config_fn))
    ).get_trace()
    assert tr.nodes["a"]["infer"] == {"enumerate": "parallel", "blah": True}
    assert tr.nodes["b"]["infer"] == {"blah": True}
    assert tr.nodes["p"]["infer"] == {}


# -- equalize ---------------------------------------------------------------


def test_equalize_sample_sites():
    def per_category_model(category):
        shift = pyro.param(f"{category}_shift", jnp.zeros(()))
        mean = pyro.sample(f"{category}_mean", dist.Normal(0.0, 1.0))
        std = pyro.sample(f"{category}_std", dist.LogNormal(0.0, 1.0))
        return pyro.sample(
            f"{category}_values",
            dist.Normal(mean + shift, std),
            obs=jnp.asarray(1.0),
        )

    def model():
        return [per_category_model(c) for c in ("a", "b")]

    eq_model = poutine.equalize(
        model, sites=[r"[ab]_mean"], type="sample"
    )
    tr = poutine.trace(_seeded(eq_model)).get_trace()
    assert np.allclose(
        np.asarray(tr.nodes["a_mean"]["value"]),
        np.asarray(tr.nodes["b_mean"]["value"]),
    )
    # non-equalized sites still differ
    assert not np.allclose(
        np.asarray(tr.nodes["a_std"]["value"]),
        np.asarray(tr.nodes["b_std"]["value"]),
    )


# -- decorator interfaces ---------------------------------------------------


def test_decorator_interface_primitives():
    @poutine.trace
    def model():
        pyro.param("p", jnp.zeros(1))
        pyro.sample("obs", dist.Bernoulli(0.5), obs=jnp.asarray(1.0))

    tr = model.get_trace()
    assert tr.nodes["p"]["type"] == "param"
    assert tr.nodes["obs"]["type"] == "sample"

    @poutine.trace(graph_type="flat")
    def model2():
        pyro.param("q", jnp.zeros(1))

    tr2 = model2.get_trace()
    assert tr2.graph_type == "flat"


def test_method_decorator_interface_condition():
    class Model:
        @poutine.condition(data={"z": jnp.asarray(2.0)})
        def model(self):
            return pyro.sample("z", dist.Normal(0.0, 1.0))

    tr = poutine.trace(_seeded(Model().model)).get_trace()
    assert float(tr.nodes["z"]["value"]) == 2.0


# -- error messages ---------------------------------------------------------


def test_trace_log_prob_err_msg(model_guide):
    model, _ = model_guide
    tr = poutine.trace(_seeded(model)).get_trace()
    # scoring an inconsistent value should raise with the site name
    tr.nodes["latent1"]["value"] = jnp.zeros((7, 3))
    with pytest.raises(Exception):
        tr.compute_log_prob()


def test_arg_kwarg_error(model_guide):
    model, _ = model_guide
    with pytest.raises(TypeError):
        poutine.trace(_seeded(model)).get_trace(1, 2, bogus=3)


# -- DAG structure (ref tests/poutine/test_trace_struct.py) -----------------

EDGE_SETS = [
    [(1, 2), (1, 3), (3, 4), (3, 5), (4, 6), (4, 7)],
    [(1, 2), (3, 5), (1, 4), (1, 3), (5, 6), (6, 7)],
]


@pytest.mark.parametrize("edges", EDGE_SETS, ids=["tree", "chain"])
def test_topological_sort(edges):
    import itertools

    for perm in itertools.permutations(edges):
        tr = Trace()
        for n1, n2 in perm:
            tr.add_edge(n1, n2)
        top_sort = tr.topological_sort()
        expected_nodes = set().union(*edges)
        assert len(top_sort) == len(expected_nodes)
        assert set(top_sort) == expected_nodes
        ranks = {n: rank for rank, n in enumerate(top_sort)}
        for n1, n2 in edges:
            assert ranks[n1] < ranks[n2]


@pytest.mark.parametrize("edges", EDGE_SETS, ids=["tree", "chain"])
def test_connectivity_on_removal(edges):
    tr = Trace()
    for e1, e2 in edges:
        tr.add_edge(e1, e2)
    top_sort = tr.topological_sort()
    while top_sort:
        num_nodes = len(list(tr._dfs(1, set())))
        assert num_nodes == len(top_sort)
        tr.remove_node(top_sort.pop())


# -- nested handler reset (ref tests/poutine/test_nesting.py) ---------------


def test_nested_reset():
    def nested_model():
        pyro.sample("internal0", dist.Bernoulli(0.5))
        with poutine.escape(
            escape_fn=lambda msg: msg["name"] == "internal2"
        ):
            pyro.sample("internal1", dist.Bernoulli(0.5))
            pyro.sample("internal2", dist.Bernoulli(0.5))
            pyro.sample("internal3", dist.Bernoulli(0.5))

    with poutine.trace() as t2:
        with poutine.block(hide=["internal2"]):
            with poutine.trace() as t1:
                try:
                    _seeded(nested_model)()
                except NonlocalExit as site_container:
                    site_container.reset_stack()
                    assert "internal1" not in t1.trace.nodes
                    assert "internal1" in t2.trace.nodes


# -- sequential plates (ref tests/poutine/test_mapdata.py) ------------------


def test_nested_sequential_plate():
    means = [jax.random.normal(jax.random.key(i), (2,)) for i in range(8)]
    stds = [
        jnp.abs(jax.random.normal(jax.random.key(10 + i), (2,)))
        for i in range(6)
    ]

    def model(means, stds):
        a_plate = pyro.plate("a", len(means), 2)
        b_plate = pyro.plate("b", len(stds), 3)
        return [
            [
                pyro.sample(f"x_{i}{j}", dist.Normal(means[i], stds[j]))
                for j in b_plate
            ]
            for i in a_plate
        ]

    xs = poutine.seed(model, rng_key=jax.random.key(0))(means, stds)
    assert len(xs) == 2
    assert len(xs[0]) == 3

    tr = poutine.trace(_seeded(model)).get_trace(means, stds)
    sampled = [
        n
        for n, s in tr.nodes.items()
        if s["type"] == "sample" and n.startswith("x_")
    ]
    assert len(sampled) == 6
    for name in sampled:
        assert tr.nodes[name]["value"].shape == (2,)
