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
