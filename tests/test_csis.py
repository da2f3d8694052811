"""CSIS (inference compilation) behavior suite.

Mirrors the reference ``tests/infer/test_csis.py``: posterior recovery
through the trained-proposal importance sampler, parameter movement on
``step``, and frozen-validation-batch loss semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import CSIS, EmpiricalMarginal
from pyro_tpu.optim import Adam


def model(observations=None):
    if observations is None:
        observations = {"y1": 0.0, "y2": 0.0}
    # conjugate Normal chain (ref test_csis.py:15): posterior of x given
    # (y1, y2) is Normal with mean (y1+y2)*5/12
    x = pyro.sample("x", dist.Normal(0.0, 5.0**0.5))
    pyro.sample("y1", dist.Normal(x, 2.0**0.5), obs=observations["y1"])
    pyro.sample("y2", dist.Normal(x, 2.0**0.5), obs=observations["y2"])
    return x


def guide(observations=None):
    if observations is None:
        observations = {"y1": 0.0, "y2": 0.0}
    # linear-in-summed-obs proposal (ref test_csis.py:22 Guide)
    w = pyro.param("w", jnp.array(0.2))
    std = pyro.param("std", jnp.array(1.0))
    summed = observations["y1"] + observations["y2"]
    pyro.sample("x", dist.Normal(w * summed, jnp.abs(std) + 1e-4))


def _fresh():
    pyro.clear_param_store()
    pyro.set_rng_seed(7)


def test_csis_sampling():
    _fresh()
    csis = CSIS(model, guide, Adam({"lr": 1e-2}), num_inference_samples=500)
    # y1 = -1, y2 = +1: proposal and true posterior both have zero mean
    obs = {"y1": jnp.array(-1.0), "y2": jnp.array(1.0)}
    csis.step()  # registers guide params
    posterior = csis.run(obs, rng_key=jax.random.key(3))
    samples = posterior.get_samples()["x"]
    assert samples.shape[0] == 500
    marginal = EmpiricalMarginal(posterior, "x")
    assert abs(float(marginal.mean)) < 0.1


def test_csis_parameter_update():
    _fresh()
    guide({"y1": jnp.array(0.0), "y2": jnp.array(0.0)})  # register params
    store = pyro.get_param_store()
    initial = {k: float(np.asarray(store[k])) for k in ("w", "std")}
    csis = CSIS(model, guide, Adam({"lr": 1e-2}))
    csis.step()
    for k, v0 in initial.items():
        assert float(np.asarray(store[k])) != v0, k


def test_csis_validation_batch():
    _fresh()
    csis = CSIS(model, guide, Adam({"lr": 1e-2}), validation_batch_size=5)
    init_loss_1 = csis.validation_loss()
    init_loss_2 = csis.validation_loss()
    assert init_loss_1 == init_loss_2
    csis.step()
    next_loss = csis.validation_loss()
    assert next_loss != init_loss_1
    assert len(csis.validation_batch) == 5


def test_csis_training_reduces_validation_loss():
    _fresh()
    csis = CSIS(
        model,
        guide,
        Adam({"lr": 5e-2}),
        training_batch_size=8,
        validation_batch_size=16,
    )
    first = csis.validation_loss()
    for _ in range(50):
        csis.step()
    assert csis.validation_loss() < first
