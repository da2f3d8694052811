"""ELBO gradient-estimator correctness.

Mirrors the reference's ``tests/infer/test_gradient.py``:

* ``test_particle_gradient`` — the single-particle gradient equals the
  hand-derived pathwise (reparameterized) or score-function
  (non-reparameterized) estimator *pointwise*, not just in expectation
  (ref ``test_gradient.py:50-127``).
* ``test_subsample_gradient`` — with plate subsampling the scaled
  estimator stays unbiased: mean gradient over many particles matches
  the analytic value (ref ``test_gradient.py:148-215``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.distributions.testing import fakes
from pyro_tpu.infer import (
    Trace_ELBO,
    TraceEnum_ELBO,
    TraceGraph_ELBO,
    TraceMeanField_ELBO,
)
from pyro_tpu.infer.svi import ParamsMessenger

DATA = jnp.asarray([-0.5, 2.0])


def _grads_and_traces(elbo, model, guide, key):
    """Gradient of the surrogate loss w.r.t. all unconstrained params,
    plus the (model, guide) traces drawn with the same rng_key."""
    pyro.clear_param_store()
    elbo.loss(model, guide, rng_key=jax.random.key(99))  # materialize
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p, k):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(model, guide, rng_key=k)

    grads = jax.grad(loss_fn)(params, key)
    with ParamsMessenger(params, store):
        model_tr, guide_tr = next(
            iter(elbo._get_traces(model, guide, (), {}, key))
        )
    model_tr.compute_log_prob()
    guide_tr.compute_log_prob()
    return grads, model_tr, guide_tr, params


@pytest.mark.parametrize(
    "reparameterized", [True, False], ids=["reparam", "nonreparam"]
)
def test_particle_gradient(reparameterized):
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal

    def model():
        with pyro.plate("data", len(DATA)):
            z = pyro.sample("z", Normal(0.0, 1.0))
            pyro.sample("x", Normal(z, 1.0), obs=DATA)

    def guide():
        scale = pyro.param("scale", jnp.ones(1))
        with pyro.plate("data", len(DATA)):
            loc = pyro.param("loc", jnp.zeros(len(DATA)), event_dim=0)
            pyro.sample("z", Normal(loc, scale))

    elbo = Trace_ELBO(num_particles=1, max_plate_nesting=1)
    grads, model_tr, guide_tr, params = _grads_and_traces(
        elbo, model, guide, jax.random.key(0)
    )

    x = np.asarray(DATA)
    z = np.asarray(guide_tr.nodes["z"]["value"])
    loc = np.asarray(params["loc"])
    scale = np.asarray(params["scale"])

    if reparameterized:
        # pathwise estimator (ref test_gradient.py:96-102)
        expected = {
            "scale": -((-z * (z - loc) + (x - z) * (z - loc) + 1).sum(
                keepdims=True
            ) / scale),
            "loc": -(-z + (x - z)),
        }
    else:
        # score-function estimator (ref test_gradient.py:104-123)
        elbo_terms = (
            np.asarray(model_tr.nodes["x"]["log_prob"])
            + np.asarray(model_tr.nodes["z"]["log_prob"])
            - np.asarray(guide_tr.nodes["z"]["log_prob"])
        )
        dlogq_dloc = (z - loc) / scale**2
        dlogq_dscale = (z - loc) ** 2 / scale**3 - 1 / scale
        expected = {
            "scale": -(dlogq_dscale * elbo_terms).sum(keepdims=True),
            "loc": -(dlogq_dloc * elbo_terms),
        }

    for name in sorted(expected):
        np.testing.assert_allclose(
            np.asarray(grads[name]), expected[name], atol=1e-4, err_msg=name
        )


def _mean_grads(elbo_cls, model, guide, num_particles, key, **elbo_kw):
    pyro.clear_param_store()
    elbo = elbo_cls(
        num_particles=num_particles,
        max_plate_nesting=1,
        vectorize_particles=True,
        **elbo_kw,
    )
    elbo.loss(model, guide, rng_key=jax.random.key(99))
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p, k):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(model, guide, rng_key=k)

    return jax.jit(jax.grad(loss_fn))(params, key)


@pytest.mark.parametrize(
    "reparameterized", [True, False], ids=["reparam", "nonreparam"]
)
@pytest.mark.parametrize("subsample", [False, True], ids=["full", "subsample"])
@pytest.mark.parametrize(
    "Elbo",
    [Trace_ELBO, TraceGraph_ELBO, TraceMeanField_ELBO, TraceEnum_ELBO],
    ids=lambda c: c.__name__,
)
def test_subsample_gradient(Elbo, reparameterized, subsample):
    if Elbo is TraceMeanField_ELBO and not reparameterized:
        pytest.skip("mean-field requires reparameterized guides")
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal
    subsample_size = 1 if subsample else len(DATA)
    # analytic gradient of -E[ELBO] at loc=0, scale=1
    # (ref test_gradient.py:208-211)
    expected = {
        "loc": np.array([0.5, -2.0]),
        "scale": np.array([2.0]),
    }

    def make_fns(ind):
        def model():
            with pyro.plate("data", len(DATA), subsample_size, ind):
                x = DATA if ind is None else DATA[ind]
                z = pyro.sample("z", Normal(0.0, 1.0))
                pyro.sample("x", Normal(z, 1.0), obs=x)

        def guide():
            scale = pyro.param("scale", jnp.ones(1))
            with pyro.plate("data", len(DATA), subsample_size, ind):
                loc = pyro.param(
                    "loc", jnp.zeros(len(DATA)), event_dim=0
                )
                pyro.sample("z", Normal(loc, scale))

        return model, guide

    n = 10000 if reparameterized else 50000
    if subsample:
        # run each subsample index once; the sum over indices should be
        # an unbiased estimate of 2x the full gradient
        acc = {}
        for i, seed in [(0, 1), (1, 2)]:
            model, guide = make_fns(jnp.asarray([i]))
            g = _mean_grads(Elbo, model, guide, n, jax.random.key(seed))
            for k, v in g.items():
                acc[k] = acc.get(k, 0.0) + np.asarray(v)
        actual = {k: v / 2.0 for k, v in acc.items()}
    else:
        model, guide = make_fns(None)
        actual = _mean_grads(Elbo, model, guide, n, jax.random.key(1))

    for name in sorted(expected):
        np.testing.assert_allclose(
            np.asarray(actual[name]),
            expected[name],
            atol=0.11 if reparameterized else 0.25,
            err_msg=f"{Elbo.__name__} {name}",
        )


@pytest.mark.parametrize(
    "reparameterized", [True, False], ids=["reparam", "nonreparam"]
)
@pytest.mark.parametrize(
    "Elbo",
    [Trace_ELBO, TraceGraph_ELBO, TraceMeanField_ELBO, TraceEnum_ELBO],
    ids=lambda c: c.__name__,
)
def test_plate_nuisance_sites(Elbo, reparameterized):
    """Explicit particles plate (dim=-2) + nuisance sites sampled in
    DIFFERENT orders by model and guide (ref ``test_gradient.py:224``):
    interleaved unrelated sites must not corrupt the z gradient — a
    direct regression test for TraceGraph downstream-cost ordering."""
    if Elbo is TraceMeanField_ELBO and not reparameterized:
        pytest.skip("mean-field requires reparameterized guides")
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal
    num_particles = 50000 if reparameterized else 200000

    def model():
        particles_plate = pyro.plate("particles", num_particles, dim=-2)
        data_plate = pyro.plate("data", len(DATA), dim=-1)
        pyro.sample("nuisance_a", Normal(0.0, 1.0))
        with particles_plate, data_plate:
            z = pyro.sample("z", Normal(0.0, 1.0))
        pyro.sample("nuisance_b", Normal(2.0, 3.0))
        with data_plate, particles_plate:
            pyro.sample("x", Normal(z, 1.0), obs=DATA)
        pyro.sample("nuisance_c", Normal(4.0, 5.0))

    def guide():
        loc = pyro.param("loc", jnp.zeros(len(DATA)))
        scale = pyro.param("scale", jnp.ones(1))
        pyro.sample("nuisance_c", Normal(4.0, 5.0))
        with pyro.plate("particles", num_particles, dim=-2):
            with pyro.plate("data", len(DATA), dim=-1):
                pyro.sample("z", Normal(loc, scale))
        pyro.sample("nuisance_b", Normal(2.0, 3.0))
        pyro.sample("nuisance_a", Normal(0.0, 1.0))

    pyro.clear_param_store()
    elbo = Elbo(
        num_particles=1,
        max_plate_nesting=2,
        strict_enumeration_warning=False,
    )
    elbo.loss(model, guide, rng_key=jax.random.key(99))
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p, k):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(model, guide, rng_key=k)

    grads = jax.jit(jax.grad(loss_fn))(params, jax.random.key(1))
    actual = {k: np.asarray(v) / num_particles for k, v in grads.items()}
    expected = {"loc": np.array([0.5, -2.0]), "scale": np.array([2.0])}
    for name in sorted(expected):
        np.testing.assert_allclose(
            actual[name],
            expected[name],
            atol=0.06 if reparameterized else 0.12,
            err_msg=f"{Elbo.__name__} {name}",
        )


@pytest.mark.parametrize(
    "reparameterized", [True, False], ids=["reparam", "nonreparam"]
)
@pytest.mark.parametrize(
    "Elbo",
    [Trace_ELBO, TraceGraph_ELBO, TraceMeanField_ELBO, TraceEnum_ELBO],
    ids=lambda c: c.__name__,
)
def test_plate_elbo_vectorized_particles(Elbo, reparameterized):
    """Same nuisance-site model driven through the built-in
    vectorize_particles machinery (ref ``test_gradient.py:277``)."""
    if Elbo is TraceMeanField_ELBO and not reparameterized:
        pytest.skip("mean-field requires reparameterized guides")
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal
    num_particles = 50000 if reparameterized else 200000

    def model():
        data_plate = pyro.plate("data", len(DATA))
        pyro.sample("nuisance_a", Normal(0.0, 1.0))
        with data_plate:
            z = pyro.sample("z", Normal(0.0, 1.0))
        pyro.sample("nuisance_b", Normal(2.0, 3.0))
        with data_plate:
            pyro.sample("x", Normal(z, 1.0), obs=DATA)
        pyro.sample("nuisance_c", Normal(4.0, 5.0))

    def guide():
        loc = pyro.param("loc", jnp.zeros(len(DATA)))
        scale = pyro.param("scale", jnp.ones(1))
        pyro.sample("nuisance_c", Normal(4.0, 5.0))
        with pyro.plate("data", len(DATA)):
            pyro.sample("z", Normal(loc, scale))
        pyro.sample("nuisance_b", Normal(2.0, 3.0))
        pyro.sample("nuisance_a", Normal(0.0, 1.0))

    actual = _mean_grads(
        Elbo,
        model,
        guide,
        num_particles,
        jax.random.key(1),
        strict_enumeration_warning=False,
    )
    expected = {"loc": np.array([0.5, -2.0]), "scale": np.array([2.0])}
    for name in sorted(expected):
        np.testing.assert_allclose(
            np.asarray(actual[name]),
            expected[name],
            atol=0.06 if reparameterized else 0.12,
            err_msg=f"{Elbo.__name__} {name}",
        )


@pytest.mark.parametrize(
    "reparameterized,has_rsample",
    [(True, None), (True, False), (True, True), (False, None)],
    ids=["reparam", "reparam-False", "reparam-True", "nonreparam"],
)
@pytest.mark.parametrize(
    "Elbo", [Trace_ELBO, TraceEnum_ELBO], ids=lambda c: c.__name__
)
def test_particle_gradient_force_rsample(Elbo, reparameterized, has_rsample):
    """The ``has_rsample_()`` instance override flips the estimator
    (ref ``test_gradient.py:38-146``): forcing ``False`` on a
    reparameterized Normal must give the score-function gradient
    pointwise; TraceEnum_ELBO's Dice factor adds the exact ``-dlogq``
    entropy term that Trace_ELBO leaves to expectation."""
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal

    def model():
        with pyro.plate("data", len(DATA)):
            z = pyro.sample("z", Normal(0.0, 1.0))
            pyro.sample("x", Normal(z, 1.0), obs=DATA)

    def guide():
        scale = pyro.param("scale", jnp.ones(1))
        with pyro.plate("data", len(DATA)):
            loc = pyro.param("loc", jnp.zeros(len(DATA)), event_dim=0)
            z_dist = Normal(loc, scale)
            if has_rsample is not None:
                z_dist.has_rsample_(has_rsample)
            pyro.sample("z", z_dist)

    elbo = Elbo(num_particles=1, max_plate_nesting=1)
    grads, model_tr, guide_tr, params = _grads_and_traces(
        elbo, model, guide, jax.random.key(0)
    )

    x = np.asarray(DATA)
    z = np.asarray(guide_tr.nodes["z"]["value"])
    loc = np.asarray(params["loc"])
    scale = np.asarray(params["scale"])

    if reparameterized and has_rsample is not False:
        # pathwise estimator (ref test_gradient.py:96-102)
        expected = {
            "scale": -(
                (-z * (z - loc) + (x - z) * (z - loc) + 1).sum(keepdims=True)
                / scale
            ),
            "loc": -(-z + (x - z)),
        }
    else:
        # score-function estimator (ref test_gradient.py:104-127)
        elbo_terms = (
            np.asarray(model_tr.nodes["x"]["log_prob"])
            + np.asarray(model_tr.nodes["z"]["log_prob"])
            - np.asarray(guide_tr.nodes["z"]["log_prob"])
        )
        dlogq_dloc = (z - loc) / scale**2
        dlogq_dscale = (z - loc) ** 2 / scale**3 - 1 / scale
        if Elbo is TraceEnum_ELBO:
            expected = {
                "scale": -(dlogq_dscale * elbo_terms - dlogq_dscale).sum(
                    keepdims=True
                ),
                "loc": -(dlogq_dloc * elbo_terms - dlogq_dloc),
            }
        else:
            expected = {
                "scale": -(dlogq_dscale * elbo_terms).sum(keepdims=True),
                "loc": -(dlogq_dloc * elbo_terms),
            }

    for name in sorted(expected):
        np.testing.assert_allclose(
            np.asarray(grads[name]),
            expected[name],
            atol=1e-4,
            err_msg=f"{Elbo.__name__} {name}",
        )


@pytest.mark.parametrize("subsample", [False, True], ids=["full", "subsample"])
@pytest.mark.parametrize(
    "reparameterized", [True, False], ids=["reparam", "nonreparam"]
)
@pytest.mark.parametrize(
    "Elbo", [Trace_ELBO, TraceGraph_ELBO], ids=lambda c: c.__name__
)
def test_subsample_gradient_sequential(Elbo, reparameterized, subsample):
    """Sequential (non-vectorized) particles with FRESH random subsample
    indices per estimate stay unbiased (ref ``test_gradient.py:354-392``):
    the mean gradient over many sequential 10-particle estimates matches
    the analytic full-data gradient."""
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal
    subsample_size = 1 if subsample else len(DATA)

    def model():
        with pyro.plate("data", len(DATA), subsample_size) as ind:
            x = DATA[ind]
            z = pyro.sample("z", Normal(0.0, 1.0).expand_by(x.shape))
            pyro.sample("x", Normal(z, 1.0), obs=x)

    def guide():
        loc = pyro.param("loc", jnp.zeros(len(DATA)))
        scale = pyro.param("scale", jnp.ones(1))
        with pyro.plate("data", len(DATA), subsample_size) as ind:
            pyro.sample("z", Normal(loc[ind], scale))

    pyro.clear_param_store()
    elbo = Elbo(
        num_particles=10, max_plate_nesting=1, vectorize_particles=False
    )
    elbo.loss(model, guide, rng_key=jax.random.key(99))  # materialize params
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p, k):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(model, guide, rng_key=k)

    grad_fn = jax.jit(jax.grad(loss_fn))
    # 5000 particles matches the reference; the score-function +
    # subsample combination needs more for the same precision
    iters = 2000 if (subsample and not reparameterized) else 500
    keys = jax.random.split(jax.random.key(1), iters)

    def body(acc, k):
        g = grad_fn(params, k)
        return jax.tree_util.tree_map(jnp.add, acc, g), None

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    acc, _ = jax.lax.scan(body, zero, keys)
    actual = {k: np.asarray(v) / iters for k, v in acc.items()}

    expected = {"loc": np.array([0.5, -2.0]), "scale": np.array([2.0])}
    for name in sorted(expected):
        np.testing.assert_allclose(
            actual[name],
            expected[name],
            atol=0.333,  # the reference's statistical precision
            err_msg=f"{Elbo.__name__} {name}",
        )


@pytest.mark.parametrize(
    "reparameterized", [True, False], ids=["reparam", "nonreparam"]
)
def test_scaled_gradient(reparameterized):
    """poutine.scale multiplies the expected gradient exactly
    (ref test_gradient.py:148 scale parametrization)."""
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal
    scale = 2.0

    def model():
        with pyro.plate("data", len(DATA)):
            z = pyro.sample("z", Normal(0.0, 1.0))
            pyro.sample("x", Normal(z, 1.0), obs=DATA)

    def guide():
        s = pyro.param("scale", jnp.ones(1))
        with pyro.plate("data", len(DATA)):
            loc = pyro.param("loc", jnp.zeros(len(DATA)), event_dim=0)
            pyro.sample("z", Normal(loc, s))

    smodel = poutine.scale(model, scale=scale)
    sguide = poutine.scale(guide, scale=scale)
    n = 10000 if reparameterized else 50000
    actual = _mean_grads(Trace_ELBO, smodel, sguide, n, jax.random.key(1))
    expected = {
        "loc": scale * np.array([0.5, -2.0]),
        "scale": scale * np.array([2.0]),
    }
    for name in sorted(expected):
        np.testing.assert_allclose(
            np.asarray(actual[name]),
            expected[name],
            atol=(0.11 if reparameterized else 0.3) * scale,
            err_msg=name,
        )
