"""PyroModule behavior suite (mirrors the reference's
``tests/nn/test_module.py``: PyroParam constraints, PyroSample caching
per execution, submodule name prefixing, trace integration, module
lists, pyro_method)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.nn import (
    PyroModule,
    PyroModuleList,
    PyroParam,
    PyroSample,
    pyro_method,
)


@pytest.fixture(autouse=True)
def _clear():
    pyro.clear_param_store()
    yield
    pyro.clear_param_store()


class Linear(PyroModule):
    def __init__(self, name=""):
        super().__init__(name)
        self.weight = PyroParam(jnp.ones((2, 2)))
        self.scale = PyroParam(
            jnp.asarray(1.5), constraint=dist.constraints.positive
        )

    def forward(self, x):
        return x @ self.weight


def test_param_reads_through_store():
    m = Linear("lin")
    w = m.weight
    assert w.shape == (2, 2)
    assert "lin.weight" in pyro.get_param_store()
    # store-backed: mutating the store changes the attribute
    pyro.get_param_store()["lin.weight"] = 2.0 * jnp.ones((2, 2))
    assert np.allclose(np.asarray(m.weight), 2.0)


def test_param_constraint_applied():
    m = Linear("lin")
    assert float(m.scale) == pytest.approx(1.5)
    un = pyro.get_param_store().get_all_unconstrained()["lin.scale"]
    assert float(jnp.exp(un)) == pytest.approx(1.5, rel=1e-5)


def test_sample_cached_within_call_fresh_across_calls():
    class Model(PyroModule):
        def __init__(self):
            super().__init__("m")
            self.z = PyroSample(dist.Normal(0.0, 1.0))

        def forward(self):
            return self.z, self.z  # two reads, one draw

    m = Model()
    a, b = poutine.seed(m, 0)()
    assert float(a) == float(b)
    c, _ = poutine.seed(m, 1)()
    assert float(a) != float(c)


def test_sample_prior_can_depend_on_params():
    class Model(PyroModule):
        def __init__(self):
            super().__init__("m")
            self.scale = PyroParam(
                jnp.asarray(2.0), constraint=dist.constraints.positive
            )
            self.z = PyroSample(
                lambda self: dist.Normal(0.0, self.scale)
            )

        def forward(self):
            return self.z

    m = Model()
    tr = poutine.trace(poutine.seed(m, 0)).get_trace()
    site = tr.nodes["m.z"]
    assert float(site["fn"].scale) == pytest.approx(2.0)


def test_submodule_name_prefixing():
    class Outer(PyroModule):
        def __init__(self):
            super().__init__("outer")
            self.inner = Linear()

        def forward(self, x):
            return self.inner(x)

    o = Outer()
    o.inner.weight  # touch to register
    assert "outer.inner.weight" in pyro.get_param_store()


def test_trace_records_module_sites():
    class Model(PyroModule):
        def __init__(self):
            super().__init__("bnn")
            self.w = PyroSample(dist.Normal(0.0, 1.0))

        def forward(self, x):
            return pyro.sample(
                "obs", dist.Normal(self.w * x, 1.0), obs=x
            )

    m = Model()
    tr = poutine.trace(poutine.seed(m, 0)).get_trace(jnp.asarray(1.0))
    assert set(tr.nodes) >= {"bnn.w", "obs"}
    assert tr.nodes["bnn.w"]["type"] == "sample"


def test_module_list():
    layers = PyroModuleList([Linear(), Linear()])
    assert len(layers) == 2
    for i, layer in enumerate(layers):
        assert isinstance(layer, Linear)
    # distinct param names per element
    layers[0].weight
    layers[1].weight
    names = set(pyro.get_param_store().keys())
    assert any("0.weight" in n for n in names)
    assert any("1.weight" in n for n in names)


def test_pyro_method_caching():
    class Model(PyroModule):
        def __init__(self):
            super().__init__("m")
            self.z = PyroSample(dist.Normal(0.0, 1.0))

        @pyro_method
        def other(self):
            return self.z, self.z

    m = Model()
    a, b = poutine.seed(m.other, 0)()
    assert float(a) == float(b)


def test_named_pyro_params():
    class Outer(PyroModule):
        def __init__(self):
            super().__init__("outer")
            self.inner = Linear()
            self.bias = PyroParam(jnp.zeros(2))

        def forward(self):
            return self.bias

    o = Outer()
    names = dict(o.named_pyro_params())
    assert "outer.bias" in names
    assert "outer.inner.weight" in names


def test_delattr_removes_param():
    m = Linear("lin")
    m.weight  # register
    del m.weight
    with pytest.raises(AttributeError):
        m.weight


def test_svi_trains_pyro_module():
    """A PyroModule guide's params update through SVI (end-to-end)."""
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    data = jnp.asarray([1.0, 1.5, 0.5])

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("N", data.shape[0]):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    class Guide(PyroModule):
        def __init__(self):
            super().__init__("guide")
            self.loc = PyroParam(jnp.asarray(0.0))

        def forward(self, data):
            pyro.sample("loc", dist.Delta(self.loc))

    guide = Guide()
    svi = SVI(model, guide, Adam({"lr": 0.1}), Trace_ELBO())
    for _ in range(200):
        svi.step(data)
    assert abs(
        float(pyro.get_param_store()["guide.loc"]) - 1.0
    ) < 0.1


# -- ported reference behaviors (ref tests/nn/test_module.py) ----------------


def test_names_no_root_prefix():
    """Ref ``test_names``: an unnamed root module contributes no prefix."""

    class Model(PyroModule):
        def __init__(self):
            super().__init__()
            self.y = PyroParam(
                jnp.asarray(1.0), constraint=dist.constraints.positive
            )
            self.p = PyroModule()
            self.p.w = PyroParam(
                jnp.asarray(4.0), constraint=dist.constraints.positive
            )

        def forward(self):
            self.y
            self.p.w

    m = Model()
    m()
    assert set(pyro.get_param_store().keys()) == {"y", "p.w"}
    assert set(k for k, _ in m.named_pyro_params()) == {"y", "p.w"}
    # named_parameters uses the _unconstrained suffix for constrained leaves
    assert set(k for k, _ in m.named_parameters()) == {
        "y_unconstrained",
        "p.w_unconstrained",
    }


def test_delete_then_redeclare():
    """Ref ``test_delete``: re-declaring after delete takes the new init."""
    m = PyroModule()
    m.a = PyroParam(jnp.asarray(1.0))
    assert float(m.a) == 1.0
    del m.a
    m.a = PyroParam(jnp.asarray(0.1))
    assert float(m.a) == pytest.approx(0.1)


def test_nested_children():
    """Ref ``test_nested``: same attribute name in sibling children."""

    class Child(PyroModule):
        def __init__(self, a):
            super().__init__()
            self.a = PyroParam(a, dist.constraints.positive)

    class Family(PyroModule):
        def __init__(self):
            super().__init__()
            self.child1 = Child(jnp.asarray(1.0))
            self.child2 = Child(jnp.asarray(2.0))

    f = Family()
    assert float(f.child1.a) == pytest.approx(1.0)
    assert float(f.child2.a) == pytest.approx(2.0)


def test_module_cache_replacement():
    """Ref ``test_module_cache``: replacing a submodule takes the new
    module's initial values."""

    class Child(PyroModule):
        def __init__(self, x):
            super().__init__()
            self.a = PyroParam(jnp.asarray(x))

        def forward(self):
            return self.a

    class Family(PyroModule):
        def __init__(self):
            super().__init__()
            self.c = Child(1.0)

        def forward(self):
            return self.c.a

    f = Family()
    assert float(f()) == 1.0
    f.c = Child(3.0)
    assert float(f()) == 3.0
    assert float(f.c()) == 3.0


@pytest.mark.parametrize(
    "constraint_",
    [
        dist.constraints.positive,
        dist.constraints.real,
        dist.constraints.unit_interval,
    ],
    ids=["positive", "real", "unit_interval"],
)
@pytest.mark.parametrize("shape", [(), (4,), (3, 2)])
def test_constraints_matrix(shape, constraint_):
    """Ref ``test_constraints``: constrained read, unconstrained leaf,
    constrained assignment, delete."""
    module = PyroModule()
    module.x = PyroParam(jnp.full(shape, 1e-4), constraint_)

    assert module.x.shape == shape
    assert np.all(np.asarray(constraint_.check(module.x)))
    assert module.x_unconstrained.shape == shape

    # constrained assignment through the attribute
    new_value = jnp.exp(jnp.asarray(np.random.RandomState(0).randn(*shape))) * 1e-6
    module.x = new_value
    assert module.x.shape == shape
    assert np.all(np.asarray(constraint_.check(module.x)))
    np.testing.assert_allclose(
        np.asarray(module.x), np.asarray(new_value), rtol=1e-4
    )

    del module.x
    assert "x" not in module._pyro_params
    assert not hasattr(module, "x")
    assert not hasattr(module, "x_unconstrained")


def test_cache_within_and_across_calls():
    """Ref ``test_cache``: sample attributes cached within one __call__,
    fresh across calls; shared context with submodules."""

    class MyModule(PyroModule):
        def forward(self):
            return [self.gather(), self.gather()]

        def gather(self):
            return {"c": self.c, "p.f": self.p.f}

    module = MyModule()
    module.c = PyroSample(dist.Normal(0.0, 1.0))
    module.p = PyroModule()
    module.p.f = PyroSample(dist.Normal(0.0, 1.0))

    assert module._pyro_context is module.p._pyro_context

    r1 = poutine.seed(module, 0)()
    for key in ["c", "p.f"]:
        assert r1[0][key] is r1[1][key], key
    r2 = poutine.seed(module, 1)()
    for key in ["c", "p.f"]:
        assert float(r1[0][key]) != float(r2[0][key]), key


def test_bayesian_linear_svi_smoke():
    """Ref ``test_sample``: PyroSample weight + mean-field guide train."""
    from pyro_tpu.infer import SVI, Trace_ELBO
    from pyro_tpu.optim import Adam

    class Model(PyroModule):
        def __init__(self, in_features, out_features):
            super().__init__("mod")
            self.in_features = in_features
            self.out_features = out_features
            self.weight = PyroSample(
                lambda self: dist.Normal(0.0, 1.0)
                .expand([self.out_features, self.in_features])
                .to_event(2)
            )

        def forward(self, data):
            return pyro.sample(
                "obs",
                dist.Normal(self.weight @ data, 1.0).to_event(1),
                obs=jnp.zeros(self.out_features),
            )

    class Guide(PyroModule):
        def __init__(self, in_features, out_features):
            super().__init__("mod")
            self.loc = PyroParam(jnp.zeros((out_features, in_features)))
            self.scale = PyroParam(
                jnp.ones((out_features, in_features)),
                constraint=dist.constraints.positive,
            )
            self.weight = PyroSample(
                lambda self: dist.Normal(self.loc, self.scale).to_event(2)
            )

        def forward(self, data):
            self.weight

    data = jnp.asarray(np.random.RandomState(0).randn(8))
    model = Model(8, 2)
    guide = Guide(8, 2)
    svi = SVI(model, guide, Adam({"lr": 0.01}), Trace_ELBO())
    for step in range(3):
        svi.step(data)


def test_module_list_slicing():
    """Ref ``SliceIndexingModuleListBNN``: slicing shares modules without
    renaming their sites."""
    layers = PyroModuleList([Linear(), Linear(), Linear()])
    head = layers[:-1]
    assert len(head) == 2
    assert head[0] is layers[0]
    layers[0].weight
    names = set(pyro.get_param_store().keys())
    assert any(n.endswith("0.weight") for n in names)
    # negative indexing
    assert layers[-1] is layers[2]
