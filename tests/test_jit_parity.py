"""Eager vs jit-compiled parity across estimators and kernels.

Mirrors the intent of ``/root/reference/tests/infer/test_jit.py``
(eager/compiled agreement sweeps for losses, gradients, enumeration,
and potential functions): every differentiable loss must give the same
value and gradients whether run eagerly or under ``jax.jit`` (same rng
key ⇒ same draws ⇒ exact agreement up to compilation reassociation),
and the MCMC potential must lower identically.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import (
    RenyiELBO,
    Trace_ELBO,
    TraceEnum_ELBO,
    TraceGraph_ELBO,
    TraceMeanField_ELBO,
)
from pyro_tpu.infer.svi import ParamsMessenger
from pyro_tpu.params.param_store import get_param_store

DATA = jnp.array([0.5, -0.3, 1.2, 0.1])


def model_gaussian(data):
    loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
    with pyro.plate("data", data.shape[0]):
        pyro.sample("obs", dist.Normal(loc, 0.5), obs=data)


def guide_gaussian(data):
    m = pyro.param("m", jnp.zeros(()))
    s = pyro.param(
        "s", jnp.ones(()), constraint=dist.constraints.positive
    )
    pyro.sample("loc", dist.Normal(m, s))


def model_discrete(data):
    probs = pyro.param(
        "probs",
        jnp.array([0.4, 0.6]),
        constraint=dist.constraints.simplex,
    )
    locs = pyro.param("locs", jnp.array([-1.0, 1.0]))
    with pyro.plate("data", data.shape[0]):
        k = pyro.sample(
            "k",
            dist.Categorical(probs),
            infer={"enumerate": "parallel"},
        )
        pyro.sample("obs", dist.Normal(locs[k], 0.5), obs=data)


def guide_discrete(data):
    pass


def _loss_and_grads(loss_fn, params):
    def objective(params):
        return loss_fn(params)

    val = objective(params)
    grads = jax.grad(objective)(params)
    return val, grads


def _jit_loss_and_grads(loss_fn, params):
    val = jax.jit(loss_fn)(params)
    grads = jax.jit(jax.grad(loss_fn))(params)
    return val, grads


def _setup(model, guide, elbo, *args):
    pyro.clear_param_store()
    elbo.loss(model, guide, *args, rng_key=jax.random.key(0))
    store = get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(params):
        with ParamsMessenger(params, store):
            return elbo.differentiable_loss(
                model, guide, *args, rng_key=jax.random.key(1)
            )

    return loss_fn, params


ESTIMATORS = [
    Trace_ELBO(max_plate_nesting=1),
    TraceGraph_ELBO(max_plate_nesting=1),
    TraceMeanField_ELBO(max_plate_nesting=1),
    RenyiELBO(alpha=0.5, max_plate_nesting=1),
    Trace_ELBO(num_particles=7, vectorize_particles=True, max_plate_nesting=1),
]


@pytest.mark.parametrize(
    "elbo", ESTIMATORS, ids=lambda e: type(e).__name__ + str(id(e) % 97)
)
def test_elbo_eager_equals_jit(elbo):
    loss_fn, params = _setup(model_gaussian, guide_gaussian, elbo, DATA)
    v_eager, g_eager = _loss_and_grads(loss_fn, params)
    v_jit, g_jit = _jit_loss_and_grads(loss_fn, params)
    np.testing.assert_allclose(
        float(v_eager), float(v_jit), rtol=1e-5, atol=1e-6
    )
    for name in params:
        np.testing.assert_allclose(
            np.asarray(g_eager[name]),
            np.asarray(g_jit[name]),
            rtol=1e-4,
            atol=1e-5,
            err_msg=name,
        )


def test_enum_elbo_eager_equals_jit():
    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    loss_fn, params = _setup(model_discrete, guide_discrete, elbo, DATA)
    v_eager, g_eager = _loss_and_grads(loss_fn, params)
    v_jit, g_jit = _jit_loss_and_grads(loss_fn, params)
    np.testing.assert_allclose(
        float(v_eager), float(v_jit), rtol=1e-5, atol=1e-6
    )
    for name in params:
        np.testing.assert_allclose(
            np.asarray(g_eager[name]),
            np.asarray(g_jit[name]),
            rtol=1e-4,
            atol=1e-5,
            err_msg=name,
        )


def test_enum_loss_jit_recompile_free_across_data():
    """Same shapes, different data: the jitted enum loss must not
    retrace (trace-time structure is static), and values must track the
    eager path for each dataset (ref test_jit.py's retracing concerns)."""
    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    loss_fn_base, params = _setup(
        model_discrete, guide_discrete, elbo, DATA
    )
    store = get_param_store()

    traces = []

    def loss_of_data(params, data):
        traces.append(1)
        with ParamsMessenger(params, store):
            return elbo.differentiable_loss(
                model_discrete,
                guide_discrete,
                data,
                rng_key=jax.random.key(1),
            )

    jitted = jax.jit(loss_of_data)
    d2 = DATA + 1.0
    v1 = float(jitted(params, DATA))
    v2 = float(jitted(params, d2))
    assert len(traces) == 1, "jitted enum loss retraced on same shapes"
    e1 = float(loss_of_data(params, DATA))
    e2 = float(loss_of_data(params, d2))
    np.testing.assert_allclose(v1, e1, rtol=1e-5)
    np.testing.assert_allclose(v2, e2, rtol=1e-5)
    assert abs(v1 - v2) > 1e-6  # data actually flowed through


def test_hmc_potential_eager_equals_jit():
    from pyro_tpu.infer.mcmc.util import initialize_model

    init = initialize_model(
        functools.partial(model_gaussian),
        model_args=(DATA,),
        rng_key=jax.random.key(2),
    )
    potential = init.potential_fn
    z = init.initial_params
    v_eager = float(potential(z))
    v_jit = float(jax.jit(potential)(z))
    np.testing.assert_allclose(v_eager, v_jit, rtol=1e-5)
    g_eager = jax.grad(potential)(z)
    g_jit = jax.jit(jax.grad(potential))(z)
    for k in g_eager:
        np.testing.assert_allclose(
            np.asarray(g_eager[k]), np.asarray(g_jit[k]), rtol=1e-4
        )


def test_vectorized_markov_eager_equals_jit():
    from pyro_tpu.ops.indexing import Vindex

    probs = jax.nn.softmax(jax.random.normal(jax.random.key(3), (3, 3)))
    locs = jnp.array([-1.0, 0.0, 1.0])
    tdata = jax.random.normal(jax.random.key(4), (9, 2))

    def vm_model(data):
        tones = pyro.plate("tones", data.shape[-1], dim=-1)
        x_prev = None
        for i in pyro.vectorized_markov(
            name="time", size=len(data), dim=-2
        ):
            x = pyro.sample(
                f"x_{i}",
                dist.Categorical(
                    jnp.full((3,), 1 / 3)
                    if isinstance(i, int) and i < 1
                    else probs[x_prev]
                ),
                infer={"enumerate": "parallel"},
            )
            with tones:
                pyro.sample(
                    f"y_{i}",
                    dist.Normal(Vindex(locs)[..., x], 1.0),
                    obs=data[i],
                )
            x_prev = x

    elbo = TraceEnum_ELBO(max_plate_nesting=3)

    def loss(data):
        return elbo.differentiable_loss(
            vm_model, lambda d: None, data, rng_key=jax.random.key(5)
        )

    v_eager = float(loss(tdata))
    v_jit = float(jax.jit(loss)(tdata))
    np.testing.assert_allclose(v_eager, v_jit, rtol=1e-5)
    g_eager = np.asarray(jax.grad(lambda d: jax.jit(loss)(d))(tdata))
    assert np.isfinite(g_eager).all()
