"""PyroOptim per-param hyperparameter dispatch
(ref ``tests/optim/test_optim.py`` strategy: callable optim_args routes
different lrs/clips to different params, and training respects them).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.optim import Adam, ClippedAdam, PyroOptim


def test_callable_optim_args_routes_per_param_lr():
    pyro.clear_param_store()

    def per_param(module_name, param_name):
        return {
            "learning_rate": 1.0 if param_name == "fast" else 1e-9
        }

    optim = PyroOptim(optax.sgd, per_param)

    def model():
        a = pyro.param("fast", jnp.asarray(0.0))
        b = pyro.param("slow", jnp.asarray(0.0))
        pyro.sample("obs", dist.Normal(a + b, 1.0), obs=jnp.asarray(5.0))

    svi = SVI(model, lambda: None, optim, Trace_ELBO())
    for _ in range(3):
        svi.step(rng_key=jax.random.key(0))
    fast = float(pyro.param("fast"))
    slow = float(pyro.param("slow"))
    assert abs(fast) > 1.0  # lr=1 sgd moved it
    assert abs(slow) < 1e-6  # lr=1e-9 froze it


def test_same_args_share_one_transform():
    optim = PyroOptim(optax.adam, {"learning_rate": 0.1})
    optim._resolve("a")
    optim._resolve("b")
    assert len(optim._transforms) == 1
    assert optim._name_to_argkey["a"] == optim._name_to_argkey["b"]


def test_clipped_adam_caps_update_norm():
    pyro.clear_param_store()

    def model():
        a = pyro.param("a", jnp.zeros(4))
        # gradient of this loss w.r.t. a is huge
        pyro.sample(
            "obs", dist.Normal(1e6 * a.sum(), 1.0), obs=jnp.asarray(3.0)
        )

    svi = SVI(
        model,
        lambda: None,
        ClippedAdam({"lr": 0.1, "clip_norm": 1.0}),
        Trace_ELBO(),
    )
    before = np.asarray(pyro.param("a")) if "a" in pyro.get_param_store() else np.zeros(4)
    svi.step(rng_key=jax.random.key(0))
    after = np.asarray(pyro.param("a"))
    # adam caps per-step movement near lr regardless, but a NaN/inf-free
    # bounded step is the contract under clip_norm with a 1e6-scale grad
    assert np.isfinite(after).all()
    assert np.linalg.norm(after - before) < 1.0


def test_new_param_gets_deferred_state():
    pyro.clear_param_store()
    flag = {"second": False}

    def model():
        a = pyro.param("a", jnp.asarray(0.0))
        loc = a
        if flag["second"]:
            b = pyro.param("b", jnp.asarray(0.0))
            loc = a + b
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=jnp.asarray(2.0))

    svi = SVI(model, lambda: None, Adam({"lr": 0.1}), Trace_ELBO())
    svi.step(rng_key=jax.random.key(0))
    flag["second"] = True
    # param b appears mid-training; optimizer state must extend lazily
    svi.step(rng_key=jax.random.key(1))
    svi.step(rng_key=jax.random.key(2))
    assert abs(float(pyro.param("b"))) > 0.0
