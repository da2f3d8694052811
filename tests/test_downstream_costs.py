"""TraceGraph downstream-cost computation.

Port of ``/root/reference/tests/infer/test_compute_downstream_costs.py``:

* the execution-order cost assembly (``_order_downstream_costs``, the
  analogue of the reference's dense-graph ``_compute_downstream_costs``)
  must reproduce the reference's hand-expanded cost expressions for the
  big plate model, including the plate ``sum_to`` reductions;
* the exact provenance path (``_site_dependencies``, the analogue of the
  reference's ``TrackNonReparam``) must produce per-site dependency sets
  equal to ``{site}`` when all sites are parameter-independent (the
  reference's ``_provenance_compute_downstream_costs`` check), and the
  exact hand-derived sets on chain models with real data flow;
* exact sets must always be subsets of the order-based sets;
* the jaxpr taint oracle must agree with the independent jvp-tangent
  oracle (``track_provenance``) on the same probe function.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import TraceGraph_ELBO
from pyro_tpu.infer.enum import get_importance_trace


def _traces(model, guide, *args, seed=0, **kwargs):
    return get_importance_trace(
        "flat", None, model, guide, args, kwargs,
        rng_key=jax.random.PRNGKey(seed),
    )


def _exact_costs(model, guide, *args, seed=0, **kwargs):
    """Run TraceGraph's cost computation, asserting the exact path engaged;
    returns (elbo, model_trace, guide_trace, downstream_costs, deps)."""
    elbo = TraceGraph_ELBO()
    elbo._probe_ctx = (model, guide, args, kwargs)
    elbo._dep_cache = None
    mtr, gtr = _traces(model, guide, *args, seed=seed, **kwargs)
    order = [
        n for n, s in gtr.nodes.items()
        if s["type"] == "sample" and not s["infer"].get("_do_not_score")
    ]
    dc = elbo._compute_downstream_costs(mtr, gtr, order)
    assert elbo._dep_cache is not None, "exact provenance path did not engage"
    return elbo, mtr, gtr, dc, elbo._dep_cache


def big_model_guide(
    include_obs=True,
    include_single=False,
    include_inner_1=False,
    flip_c23=False,
):
    """Ref test_compute_downstream_costs.py::big_model_guide (without the
    triple-plate block, covered by the plate reductions below)."""
    p0 = jnp.exp(jnp.asarray(-0.20))
    p1 = jnp.exp(jnp.asarray(-0.33))
    p2 = jnp.exp(jnp.asarray(-0.70))
    pyro.sample("a1", dist.Bernoulli(p0))
    if include_single:
        with pyro.plate("plate_single", 5):
            b0 = pyro.sample("b0", dist.Bernoulli(p0).expand_by([5]))
            assert b0.shape == (5,)
    with pyro.plate("plate_outer", 2):
        pyro.sample("b1", dist.Bernoulli(p0).expand_by([2]))
        if include_inner_1:
            with pyro.plate("plate_inner_1", 3):
                pyro.sample("c1", dist.Bernoulli(p1).expand_by([3, 2]))
                if flip_c23 and not include_obs:
                    pyro.sample("c3", dist.Bernoulli(p0).expand_by([3, 2]))
                    pyro.sample("c2", dist.Bernoulli(p1).expand_by([3, 2]))
                else:
                    pyro.sample("c2", dist.Bernoulli(p0).expand_by([3, 2]))
                    pyro.sample("c3", dist.Bernoulli(p2).expand_by([3, 2]))
        with pyro.plate("plate_inner_2", 4):
            pyro.sample("d1", dist.Bernoulli(p0).expand_by([4, 2]))
            d2 = pyro.sample("d2", dist.Bernoulli(p2).expand_by([4, 2]))
            assert d2.shape == (4, 2)
            if include_obs:
                pyro.sample(
                    "obs",
                    dist.Bernoulli(p0).expand_by([4, 2]),
                    obs=jnp.ones(d2.shape),
                )


def _pmg(mtr, gtr, name):
    return np.asarray(
        mtr.nodes[name]["log_prob"] - gtr.nodes[name]["log_prob"]
    )


@pytest.mark.parametrize("include_inner_1", [True, False])
@pytest.mark.parametrize("include_single", [True, False])
@pytest.mark.parametrize("flip_c23", [True, False])
def test_order_costs_big_model_guide_pair(
    include_inner_1, include_single, flip_c23
):
    """Ref test_compute_downstream_costs_big_model_guide_pair: the
    order-based assembly reproduces the hand-expanded cost expressions."""
    kwargs = dict(
        include_inner_1=include_inner_1,
        include_single=include_single,
        flip_c23=flip_c23,
    )
    model = lambda: big_model_guide(include_obs=True, **kwargs)
    guide = lambda: big_model_guide(include_obs=False, **kwargs)
    elbo = TraceGraph_ELBO()
    mtr, gtr = _traces(model, guide)
    order = [
        n for n, s in gtr.nodes.items()
        if s["type"] == "sample" and not s["infer"].get("_do_not_score")
    ]
    dc_mft = elbo._order_downstream_costs(mtr, gtr, order)
    dc = {
        n: np.asarray(dc_mft[n].sum_to(gtr.nodes[n]["cond_indep_stack"]))
        for n in order
    }

    expected_b1 = _pmg(mtr, gtr, "b1")
    expected_b1 = expected_b1 + _pmg(mtr, gtr, "d1").sum(0)
    expected_b1 = expected_b1 + _pmg(mtr, gtr, "d2").sum(0)
    expected_b1 = expected_b1 + np.asarray(
        mtr.nodes["obs"]["log_prob"]
    ).sum(0)
    if include_inner_1:
        for c in ("c1", "c2", "c3"):
            expected_b1 = expected_b1 + _pmg(mtr, gtr, c).sum(0)
    assert np.allclose(expected_b1, dc["b1"], atol=1e-6)
    assert dc["b1"].shape == (2,)

    if include_single:
        expected_b0 = _pmg(mtr, gtr, "b0")
        expected_b0 = expected_b0 + _pmg(mtr, gtr, "b1").sum()
        expected_b0 = expected_b0 + _pmg(mtr, gtr, "d1").sum()
        expected_b0 = expected_b0 + _pmg(mtr, gtr, "d2").sum()
        expected_b0 = expected_b0 + np.asarray(
            mtr.nodes["obs"]["log_prob"]
        ).sum()
        if include_inner_1:
            for c in ("c1", "c2", "c3"):
                expected_b0 = expected_b0 + _pmg(mtr, gtr, c).sum()
        assert np.allclose(expected_b0, dc["b0"], atol=1e-6)
        assert dc["b0"].shape == (5,)

    if include_inner_1:
        # the model (include_obs=True) never flips, so model order is
        # c2 then c3; flip_c23 reverses only the guide's order
        expected_c3 = _pmg(mtr, gtr, "c3")
        expected_c3 = expected_c3 + _pmg(mtr, gtr, "d1").sum(0)
        expected_c3 = expected_c3 + _pmg(mtr, gtr, "d2").sum(0)
        expected_c3 = expected_c3 + np.asarray(
            mtr.nodes["obs"]["log_prob"]
        ).sum(0)
        expected_c2 = _pmg(mtr, gtr, "c2")
        expected_c2 = expected_c2 + _pmg(mtr, gtr, "d1").sum(0)
        expected_c2 = expected_c2 + _pmg(mtr, gtr, "d2").sum(0)
        expected_c2 = expected_c2 + np.asarray(
            mtr.nodes["obs"]["log_prob"]
        ).sum(0)
        if flip_c23:
            # c2 is guide-downstream of c3; c3's model factor is
            # model-order-downstream of c2
            expected_c3 = expected_c3 + _pmg(mtr, gtr, "c2")
            expected_c2 = expected_c2 + np.asarray(
                mtr.nodes["c3"]["log_prob"]
            )
        else:
            # reference dense-graph expectation adds (p-q)(c2) to c2 a
            # second time (an overcount quirk of its dense assembly,
            # test_compute_downstream_costs.py:327-331); this assembly
            # counts each factor once
            expected_c2 = expected_c2 + _pmg(mtr, gtr, "c3")
        assert np.allclose(expected_c3, dc["c3"], atol=1e-6)
        assert dc["c3"].shape == (3, 2)
        assert np.allclose(expected_c2, dc["c2"], atol=1e-6)

    # d1/d2 (ref :337-348)
    expected_d1 = _pmg(mtr, gtr, "d1") + _pmg(mtr, gtr, "d2") + np.asarray(
        mtr.nodes["obs"]["log_prob"]
    )
    expected_d2 = _pmg(mtr, gtr, "d2") + np.asarray(
        mtr.nodes["obs"]["log_prob"]
    )
    assert np.allclose(expected_d1, dc["d1"], atol=1e-6)
    assert np.allclose(expected_d2, dc["d2"], atol=1e-6)
    assert dc["d2"].shape == (4, 2)

    # a1's cost sums everything (scalar site at the root)
    expected_a1 = _pmg(mtr, gtr, "a1")
    for n in order:
        if n != "a1":
            expected_a1 = expected_a1 + _pmg(mtr, gtr, n).sum()
    expected_a1 = expected_a1 + np.asarray(mtr.nodes["obs"]["log_prob"]).sum()
    assert np.allclose(expected_a1, dc["a1"], atol=1e-5)


@pytest.mark.parametrize("include_inner_1", [True, False])
@pytest.mark.parametrize("include_single", [True, False])
def test_exact_deps_big_model(include_inner_1, include_single):
    """All sites are parameter-independent Bernoullis, so each log_prob's
    exact dependency set is {itself} (ref
    ``_provenance_compute_downstream_costs``: ``nodes == {name}``), and the
    exact downstream cost is just the site's own p/q difference."""
    kwargs = dict(
        include_inner_1=include_inner_1, include_single=include_single
    )
    model = lambda: big_model_guide(include_obs=True, **kwargs)
    guide = lambda: big_model_guide(include_obs=False, **kwargs)
    _, mtr, gtr, dc, deps = _exact_costs(model, guide)
    for name, site in gtr.nodes.items():
        if site["type"] != "sample":
            continue
        assert deps[("g", name)] == frozenset({name}), (name, deps)
        assert deps[("m", name)] == frozenset({name}), (name, deps)
        expected = _pmg(mtr, gtr, name)
        actual = np.asarray(
            dc[name].sum_to(site["cond_indep_stack"])
        )
        assert np.allclose(expected, actual, atol=1e-6), name
    assert deps[("m", "obs")] == frozenset()


def test_exact_deps_chain():
    """Hand-derived exact dependency sets for a 3-chain with a reverse-order
    guide (the model that exposed the order-pruning bias)."""

    def model():
        z3 = pyro.sample("z3", dist.Normal(0.0, 1.0))
        z2 = pyro.sample("z2", dist.Normal(z3, 1.0))
        z1 = pyro.sample("z1", dist.Normal(z2, 1.0))
        pyro.sample("obs", dist.Normal(z1, 1.0), obs=jnp.asarray(0.5))

    from pyro_tpu.distributions.testing import fakes

    def guide():
        z1 = pyro.sample("z1", fakes.NonreparameterizedNormal(0.0, 1.0))
        z2 = pyro.sample("z2", fakes.NonreparameterizedNormal(z1, 1.0))
        pyro.sample("z3", fakes.NonreparameterizedNormal(z2, 1.0))

    _, mtr, gtr, dc, deps = _exact_costs(model, guide)
    # taints flow THROUGH non-reparam draws: z2's realized value depends
    # on z1 via the mean, so z2 carries {z1, z2} (ref ProvenanceTensor
    # unions wrapped provenance)
    assert deps[("g", "z1")] == frozenset({"z1"})
    assert deps[("g", "z2")] == frozenset({"z1", "z2"})
    assert deps[("g", "z3")] == frozenset({"z1", "z2", "z3"})
    # model factors evaluated at the guide's values
    assert deps[("m", "z3")] == frozenset({"z1", "z2", "z3"})
    assert deps[("m", "z2")] == frozenset({"z1", "z2", "z3"})
    assert deps[("m", "z1")] == frozenset({"z1", "z2"})
    assert deps[("m", "obs")] == frozenset({"z1"})

    # cost(z3): every factor containing z3 = p(z3) + p(z2|z3) - q(z3)
    expected = (
        np.asarray(mtr.nodes["z3"]["log_prob"])
        + np.asarray(mtr.nodes["z2"]["log_prob"])
        - np.asarray(gtr.nodes["z3"]["log_prob"])
    )
    actual = np.asarray(dc["z3"].sum_to(gtr.nodes["z3"]["cond_indep_stack"]))
    assert np.allclose(expected, actual, atol=1e-6)

    # cost(z1) contains every factor (root of the guide)
    expected = sum(
        np.asarray(mtr.nodes[n]["log_prob"]) for n in ("z1", "z2", "z3", "obs")
    ) - sum(np.asarray(gtr.nodes[n]["log_prob"]) for n in ("z1", "z2", "z3"))
    actual = np.asarray(dc["z1"].sum_to(gtr.nodes["z1"]["cond_indep_stack"]))
    assert np.allclose(expected, actual, atol=1e-6)


def test_exact_subset_of_order():
    """Exact dependency-derived cost node sets are subsets of the
    order-based sets (ref: provenance nodes ⊆ dense-graph nodes)."""

    def model():
        x = pyro.sample("x", dist.Normal(0.0, 1.0))
        pyro.sample("y", dist.Normal(0.0, 1.0))  # independent of x
        pyro.sample("obs", dist.Normal(x, 1.0), obs=jnp.asarray(0.3))

    from pyro_tpu.distributions.testing import fakes

    def guide():
        pyro.sample("x", fakes.NonreparameterizedNormal(0.0, 1.0))
        pyro.sample("y", fakes.NonreparameterizedNormal(0.0, 1.0))

    _, mtr, gtr, dc, deps = _exact_costs(model, guide)
    # y sampled after x but independent: exact prunes it from x's cost
    assert deps[("g", "y")] == frozenset({"y"})
    assert deps[("m", "y")] == frozenset({"y"})
    cost_x = float(dc["x"].sum_to(gtr.nodes["x"]["cond_indep_stack"]))
    expected_x = float(
        mtr.nodes["x"]["log_prob"]
        - gtr.nodes["x"]["log_prob"]
        + mtr.nodes["obs"]["log_prob"]
    )
    assert np.allclose(cost_x, expected_x, atol=1e-6)


def test_jaxpr_oracle_matches_jvp_oracle():
    """The jaxpr taint analysis agrees with the jvp-tangent oracle on a
    function with mixed dependence."""
    from pyro_tpu.ops.provenance import jaxpr_provenance, track_provenance

    def fn(d):
        a, b, c = d["a"], d["b"], d["c"]
        return {
            "s": a + b,
            "t": jnp.sin(c) * 2.0,
            "u": jnp.where(a > 0, b, 0.0) + c.sum(),
            "v": jnp.ones(3),
        }

    inputs = {
        "a": jnp.asarray(1.0),
        "b": jnp.asarray(2.0),
        "c": jnp.arange(3.0),
    }
    exact = jaxpr_provenance(fn, inputs)
    jvp = track_provenance(fn, inputs)
    assert exact["s"] == frozenset({"a", "b"}) == jvp["s"]
    assert exact["t"] == frozenset({"c"}) == jvp["t"]
    assert exact["u"] == frozenset({"a", "b", "c"})
    assert exact["v"] == frozenset()
    assert "v" not in jvp  # jvp oracle only reports nonempty sets
