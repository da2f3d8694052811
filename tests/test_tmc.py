"""Tensor Monte Carlo correctness.

Port of ``/root/reference/tests/infer/test_tmc.py``:

* categorical chains — TMC with K samples per site approximates the exact
  enumerated marginal likelihood and its parameter gradients;
* normal chains — TMC equals a flat IWAE estimate in expectation, for
  prior/factorized/nonfactorized guides, reparameterized and score-function;
* gold gradient values (computed with funsor in the reference) for the
  normal-chain marginal-likelihood gradient.

Both ``diagonal`` and ``mixture`` ancestor-thinning strategies are covered
(ref ``poutine/enum_messenger.py:17,67``).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.distributions.testing import fakes
from pyro_tpu.infer import TraceEnum_ELBO, TraceTMC_ELBO, config_enumerate
from pyro_tpu.infer.importance import vectorized_importance_weights
from pyro_tpu.infer.svi import ParamsMessenger


def _z_and_grads(elbo, model, guide, key):
    """exp(-loss) and its gradient w.r.t. all unconstrained params."""
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def z_fn(p):
        with ParamsMessenger(p, store):
            return jnp.exp(
                -elbo.differentiable_loss(model, guide, rng_key=key)
            )

    z, grads = jax.value_and_grad(z_fn)(params)
    return float(z), grads


@pytest.mark.parametrize("depth", [1, 2, 3])
@pytest.mark.parametrize("tmc_strategy", ["diagonal", "mixture"])
def test_tmc_categoricals(depth, tmc_strategy):
    """Ref test_tmc.py::test_tmc_categoricals (reduced grid)."""
    pyro.set_rng_seed(0)
    pyro.param("q0", jnp.asarray([0.4, 0.6]), constraint=dist.constraints.simplex)
    for i in range(1, depth):
        pyro.param(
            f"q{i}",
            jnp.abs(jax.random.normal(jax.random.PRNGKey(i), (2, 2))) + 0.2,
            constraint=dist.constraints.simplex,
        )
    pyro.param("qy", jnp.asarray([0.75, 0.25]), constraint=dist.constraints.unit_interval)

    data = (jax.random.uniform(jax.random.PRNGKey(41), (4, 3)) > 0.5).astype(
        jnp.float32
    )

    def model():
        x = pyro.sample("x0", dist.Categorical(probs=pyro.param("q0")))
        with pyro.plate("local", 3):
            for i in range(1, depth):
                x = pyro.sample(
                    f"x{i}", dist.Categorical(probs=pyro.param(f"q{i}")[x])
                )
            with pyro.plate("data", 4):
                pyro.sample(
                    "y", dist.Bernoulli(probs=pyro.param("qy")[x]), obs=data
                )

    guide = lambda: None

    elbo = TraceEnum_ELBO(max_plate_nesting=2)
    enum_model = config_enumerate(model, default="parallel", expand=False)
    expected_z, expected_grads = _z_and_grads(
        elbo, enum_model, guide, jax.random.PRNGKey(0)
    )

    tmc = TraceTMC_ELBO(max_plate_nesting=2)
    tmc_model = config_enumerate(
        model,
        default="parallel",
        expand=False,
        num_samples=200,
        tmc=tmc_strategy,
    )
    actual_z, actual_grads = _z_and_grads(
        tmc, tmc_model, guide, jax.random.PRNGKey(7)
    )

    assert abs(actual_z - expected_z) < 0.05, (actual_z, expected_z)
    for name in expected_grads:
        assert np.abs(
            np.asarray(actual_grads[name]) - np.asarray(expected_grads[name])
        ).max() < 0.05, (name, actual_grads[name], expected_grads[name])


def _normal_chain(depth, reparameterized):
    Normal = dist.Normal if reparameterized else fakes.NonreparameterizedNormal

    def model():
        x = pyro.sample(
            "x0", Normal(pyro.param("q2"), math.sqrt(1.0 / depth))
        )
        for i in range(1, depth):
            x = pyro.sample(f"x{i}", Normal(x, math.sqrt(1.0 / depth)))
        pyro.sample("y", Normal(x, 1.0), obs=jnp.asarray(1.0))

    def factorized_guide():
        pyro.sample(
            "x0", Normal(pyro.param("q2"), math.sqrt(1.0 / depth))
        )
        for i in range(1, depth):
            pyro.sample(
                f"x{i}", Normal(0.0, math.sqrt(float(i + 1) / depth))
            )

    def nonfactorized_guide():
        x = pyro.sample(
            "x0", Normal(pyro.param("q2"), math.sqrt(1.0 / depth))
        )
        for i in range(1, depth):
            x = pyro.sample(f"x{i}", Normal(x, math.sqrt(1.0 / depth)))

    return model, factorized_guide, nonfactorized_guide


@pytest.mark.parametrize("depth", [1, 2])
@pytest.mark.parametrize("guide_type", ["prior", "factorized", "nonfactorized"])
@pytest.mark.parametrize("reparameterized", [True, False], ids=["reparam", "nonreparam"])
def test_tmc_normals_chain_iwae(depth, guide_type, reparameterized):
    """Ref test_tmc.py::test_tmc_normals_chain_iwae (diagonal strategy)."""
    pyro.set_rng_seed(0)
    num_samples = 1000
    pyro.param("q2", jnp.asarray(0.5))
    model, factorized_guide, nonfactorized_guide = _normal_chain(
        depth, reparameterized
    )
    guide = {
        "prior": poutine.block(
            model,
            hide_fn=lambda msg: msg["type"] == "sample" and msg["is_observed"],
        ),
        "factorized": factorized_guide,
        "nonfactorized": nonfactorized_guide,
    }[guide_type]

    flat_num_samples = num_samples ** min(depth, 2)
    flat_num_samples = min(flat_num_samples, 100_000)
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def iwae_z(p):
        with ParamsMessenger(p, store):
            log_w, _, _ = vectorized_importance_weights(
                model,
                guide,
                num_samples=flat_num_samples,
                max_plate_nesting=0,
                rng_key=jax.random.PRNGKey(11),
            )
        return jnp.exp(
            jax.scipy.special.logsumexp(log_w, axis=-1)
            - math.log(float(flat_num_samples))
        )

    expected_z, expected_grads = jax.value_and_grad(iwae_z)(params)

    tmc = TraceTMC_ELBO(max_plate_nesting=0)
    tmc_model = config_enumerate(
        model, default="parallel", expand=False, num_samples=num_samples
    )
    tmc_guide = config_enumerate(
        guide, default="parallel", expand=False, num_samples=num_samples
    )
    actual_z, actual_grads = _z_and_grads(
        tmc, tmc_model, tmc_guide, jax.random.PRNGKey(5)
    )

    assert abs(actual_z - float(expected_z)) < 0.05, (actual_z, expected_z)
    grad_prec = 0.05 if reparameterized else 0.1
    for name in expected_grads:
        assert np.abs(
            np.asarray(actual_grads[name]) - np.asarray(expected_grads[name])
        ).max() < grad_prec, (name, actual_grads[name], expected_grads[name])


@pytest.mark.parametrize("depth", [1, 2, 3, 4])
@pytest.mark.parametrize("guide_type", ["prior", "factorized"])
@pytest.mark.parametrize("reparameterized", [True, False], ids=["reparam", "nonreparam"])
@pytest.mark.parametrize("tmc_strategy", ["diagonal", "mixture"])
def test_tmc_normals_chain_gradient(
    depth, guide_type, reparameterized, tmc_strategy
):
    """Ref test_tmc.py::test_tmc_normals_chain_gradient — gold gradient
    values of d/dq2 E[Z] computed with funsor upstream."""
    pyro.set_rng_seed(0)
    num_samples = 200
    pyro.param("q2", jnp.asarray(0.5))
    model, factorized_guide, _ = _normal_chain(depth, reparameterized)
    guide = {
        "prior": lambda: None,
        "factorized": factorized_guide,
    }[guide_type]

    tmc = TraceTMC_ELBO(max_plate_nesting=0)
    tmc_model = config_enumerate(
        model,
        default="parallel",
        expand=False,
        num_samples=num_samples,
        tmc=tmc_strategy,
    )
    tmc_guide = config_enumerate(
        guide,
        default="parallel",
        expand=False,
        num_samples=num_samples,
        tmc=tmc_strategy,
    )

    expected_grad = {1: 0.0999, 2: 0.0860, 3: 0.0802, 4: 0.0771}[depth]

    # average a few seeds to keep the K=200 variance inside the tolerance
    grads = []
    for seed in range(4):
        _, g = _z_and_grads(
            tmc, tmc_model, tmc_guide, jax.random.PRNGKey(seed)
        )
        grads.append(float(g["q2"]))
    actual_grad = float(np.mean(grads))

    grad_prec = 0.05 if reparameterized else 0.1
    assert abs(actual_grad - expected_grad) < grad_prec, (
        actual_grad,
        expected_grad,
        grads,
    )
