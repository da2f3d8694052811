"""Effect-based autoguide tests (mirrors ``tests/infer/test_autoguide.py``
AutoMessenger cases)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import (
    AutoHierarchicalNormalMessenger,
    AutoNormalMessenger,
    AutoRegressiveMessenger,
)
from pyro_tpu.optim import Adam

DATA = jnp.array([1.0, 2.0, 3.0])
POST_VAR = 1.0 / (1.0 / 100.0 + 3.0)
POST_LOC = POST_VAR * 6.0


def model(data):
    loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
    with pyro.plate("data", data.shape[0]):
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)


@pytest.mark.parametrize(
    "guide_cls",
    [
        AutoNormalMessenger,
        AutoHierarchicalNormalMessenger,
        AutoRegressiveMessenger,
    ],
)
def test_effect_guide_converges(guide_cls):
    guide = guide_cls(model)
    svi = SVI(model, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=8))
    for _ in range(2000):
        svi.step(DATA)
    samples = np.stack(
        [
            np.asarray(guide(DATA)["loc"])
            for _ in range(300)
        ]
    )
    assert np.abs(samples.mean() - POST_LOC) < 0.25, samples.mean()


def test_effect_guide_constrained_site():
    def model2(data):
        scale = pyro.sample("scale", dist.LogNormal(0.0, 1.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(0.0, scale), obs=data)

    guide = AutoNormalMessenger(model2)
    svi = SVI(model2, guide, Adam({"lr": 0.05}), Trace_ELBO(num_particles=4))
    for _ in range(800):
        svi.step(DATA)
    s = guide(DATA)["scale"]
    assert float(s) > 0


def test_effect_guide_data_dependent_structure():
    """Guide structure follows the model even with local latents."""

    def model3(data):
        with pyro.plate("data", data.shape[0]):
            z = pyro.sample("z", dist.Normal(0.0, 1.0))
            pyro.sample("obs", dist.Normal(z, 0.5), obs=data)

    guide = AutoNormalMessenger(model3)
    svi = SVI(model3, guide, Adam({"lr": 0.1}), Trace_ELBO(num_particles=4))
    for _ in range(800):
        svi.step(DATA)
    z = guide(DATA)["z"]
    assert z.shape == (3,)
    zs = np.stack([np.asarray(guide(DATA)["z"]) for _ in range(200)])
    # posterior mean of each local z shrinks toward its datapoint
    corr = np.corrcoef(zs.mean(0), np.asarray(DATA))[0, 1]
    assert corr > 0.95
