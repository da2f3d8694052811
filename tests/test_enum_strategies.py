"""Mixed enumeration-strategy ELBO correctness.

Every per-site combination of ``None`` (Monte Carlo), ``"sequential"``
(queue-expanded exhaustive), ``"parallel"`` (tensorized exhaustive), and
``num_samples`` (sampled/TMC enumeration) must produce the same loss and
gradients — exactly when everything is enumerated, statistically when
anything is sampled.  Ground truth is the closed-form KL differentiated
with ``jax.grad``.

Mirrors the reference's ``tests/infer/test_enum.py``
``test_elbo_berns`` (:556), ``test_elbo_categoricals`` (:635),
``test_elbo_zip`` (:3642), ``test_mixture_of_diag_normals`` (:3681).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.distributions import constraints, kl_divergence
from pyro_tpu.infer import TraceEnum_ELBO
from pyro_tpu.infer.svi import ParamsMessenger


def _loss_and_grads(elbo, model, guide, *args, key=0):
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(
                model, guide, *args, rng_key=jax.random.key(key)
            )

    loss, grads = jax.jit(jax.value_and_grad(loss_fn))(params)
    return float(loss), {k: np.asarray(v) for k, v in grads.items()}


@pytest.mark.parametrize(
    "enumerate1,enumerate2,enumerate3,num_samples",
    [
        (e1, e2, e3, num_samples)
        for e1 in [None, "sequential", "parallel"]
        for e2 in [None, "sequential", "parallel"]
        for e3 in [None, "sequential", "parallel"]
        for num_samples in [None, 10000]
        if num_samples is None
        or (e1, e2, e3) == ("parallel", "parallel", "parallel")
    ],
)
def test_elbo_berns(enumerate1, enumerate2, enumerate3, num_samples):
    pyro.clear_param_store()
    all_enumerated = all([enumerate1, enumerate2, enumerate3])
    # vectorized scalar sites are nearly free — 50k particles keeps the
    # score-function cases inside the reference's 0.1 precision
    num_particles = 1 if all_enumerated else 50000
    prec = 0.001 if all_enumerated and not num_samples else 0.1

    pyro.param("q", jnp.asarray(0.75))

    def model():
        pyro.sample("x1", dist.Bernoulli(0.1))
        pyro.sample("x2", dist.Bernoulli(0.2))
        pyro.sample("x3", dist.Bernoulli(0.3))

    def guide():
        q = pyro.param("q")
        for name, strategy in [
            ("x1", enumerate1),
            ("x2", enumerate2),
            ("x3", enumerate3),
        ]:
            infer = {"enumerate": strategy}
            if num_samples is not None:
                infer["num_samples"] = num_samples
            pyro.sample(name, dist.Bernoulli(q), infer=infer)

    def neg_elbo(q):
        return sum(
            kl_divergence(dist.Bernoulli(q), dist.Bernoulli(p))
            for p in (0.1, 0.2, 0.3)
        )

    expected_loss = float(neg_elbo(jnp.asarray(0.75)))
    expected_grad = float(jax.grad(neg_elbo)(jnp.asarray(0.75)))

    elbo = TraceEnum_ELBO(
        num_particles=num_particles,
        vectorize_particles=True,
        max_plate_nesting=1,
    )
    actual_loss, grads = _loss_and_grads(elbo, model, guide)
    np.testing.assert_allclose(actual_loss, expected_loss, atol=prec)
    np.testing.assert_allclose(grads["q"], expected_grad, atol=prec)


@pytest.mark.parametrize("num_samples", [None, 2000])
@pytest.mark.parametrize("max_plate_nesting", [0, 1])
@pytest.mark.parametrize("enumerate1", ["sequential", "parallel"])
@pytest.mark.parametrize("enumerate2", ["sequential", "parallel"])
@pytest.mark.parametrize("enumerate3", ["sequential", "parallel"])
def test_elbo_categoricals(
    enumerate1, enumerate2, enumerate3, max_plate_nesting, num_samples
):
    pyro.clear_param_store()
    p1 = jnp.asarray([0.6, 0.4])
    p2 = jnp.asarray([0.3, 0.3, 0.4])
    p3 = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    pyro.param("q1", jnp.asarray([0.4, 0.6]))
    pyro.param("q2", jnp.asarray([0.4, 0.3, 0.3]))
    pyro.param("q3", jnp.asarray([0.4, 0.3, 0.2, 0.1]))

    def model():
        pyro.sample("x1", dist.Categorical(p1))
        pyro.sample("x2", dist.Categorical(p2))
        pyro.sample("x3", dist.Categorical(p3))

    def guide():
        for name, q, strategy in [
            ("x1", pyro.param("q1"), enumerate1),
            ("x2", pyro.param("q2"), enumerate2),
            ("x3", pyro.param("q3"), enumerate3),
        ]:
            pyro.sample(
                name,
                dist.Categorical(q),
                infer={
                    "enumerate": strategy,
                    "num_samples": (
                        num_samples if strategy == "parallel" else None
                    ),
                },
            )

    def neg_elbo(qs):
        q1, q2, q3 = qs
        return (
            kl_divergence(dist.Categorical(q1), dist.Categorical(p1))
            + kl_divergence(dist.Categorical(q2), dist.Categorical(p2))
            + kl_divergence(dist.Categorical(q3), dist.Categorical(p3))
        )

    qs0 = (
        jnp.asarray([0.4, 0.6]),
        jnp.asarray([0.4, 0.3, 0.3]),
        jnp.asarray([0.4, 0.3, 0.2, 0.1]),
    )
    expected_loss = float(neg_elbo(qs0))
    expected_grads = jax.grad(neg_elbo)(qs0)

    elbo = TraceEnum_ELBO(max_plate_nesting=max_plate_nesting)
    actual_loss, grads = _loss_and_grads(elbo, model, guide)

    prec = 0.001 if not num_samples else 0.1
    np.testing.assert_allclose(actual_loss, expected_loss, atol=prec)
    for name, expected in zip(("q1", "q2", "q3"), expected_grads):
        np.testing.assert_allclose(
            grads[name], np.asarray(expected), atol=prec, err_msg=name
        )


@pytest.mark.parametrize("gate", [0.1, 0.25])
@pytest.mark.parametrize("rate", [0.5, 2.0])
def test_elbo_zip(gate, rate):
    """ZeroInflatedPoisson log_prob == enumerated Bernoulli-masked
    mixture of Delta(0) and Poisson (ref test_enum.py:3642)."""
    pyro.clear_param_store()
    pyro.param("gate", jnp.asarray(gate), constraint=constraints.unit_interval)
    pyro.param("rate", jnp.asarray(rate), constraint=constraints.positive)

    def zip_model(data):
        gate = pyro.param("gate")
        rate = pyro.param("rate")
        with pyro.plate("data", len(data)):
            pyro.sample(
                "obs", dist.ZeroInflatedPoisson(rate, gate=gate), obs=data
            )

    def composite_model(data):
        gate = pyro.param("gate")
        rate = pyro.param("rate")
        dist1 = dist.Delta(jnp.asarray(0.0))
        dist0 = dist.Poisson(rate)
        with pyro.plate("data", len(data)):
            mask = pyro.sample(
                "mask", dist.Bernoulli(gate), infer={"enumerate": "parallel"}
            ).astype(bool)
            pyro.sample(
                "obs", dist.MaskedMixture(mask, dist0, dist1), obs=data
            )

    def guide(data):
        pass

    data = jnp.asarray([0.0, 1.0, 2.0])
    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    zip_loss, zip_grads = _loss_and_grads(elbo, zip_model, guide, data)
    comp_loss, comp_grads = _loss_and_grads(elbo, composite_model, guide, data)
    np.testing.assert_allclose(comp_loss, zip_loss, rtol=1e-5, atol=1e-6)
    for name in zip_grads:
        np.testing.assert_allclose(
            comp_grads[name], zip_grads[name], rtol=1e-4, atol=1e-5,
            err_msg=name,
        )


@pytest.mark.parametrize(
    "mixture,scale",
    [
        ("MixtureOfDiagNormals", [[2.0, 1.0], [1.0, 2.0], [4.0, 4.0]]),
        ("MixtureOfDiagNormalsSharedCovariance", [2.0, 1.0]),
    ],
)
def test_mixture_of_diag_normals(mixture, scale):
    """Mixture log_prob == enumerated Categorical over masked component
    plates (ref test_enum.py:3681)."""
    pyro.clear_param_store()
    mixture = getattr(dist, mixture)
    pyro.param("locs", jnp.asarray([[0.0, 0.0], [0.0, 1.0], [0.0, 10.0]]))
    pyro.param(
        "coord_scale", jnp.asarray(scale), constraint=constraints.positive
    )
    pyro.param("component_logits", jnp.asarray([0.0, -1.0, 2.0]))
    data = jnp.asarray([[0.0, 0.0], [1.0, 1.0], [2.0, 3.0], [1.0, 11.0]])

    def auto_model():
        locs = pyro.param("locs")
        coord_scale = pyro.param("coord_scale")
        component_logits = pyro.param("component_logits")
        with pyro.plate("data", len(data)):
            pyro.sample(
                "obs",
                mixture(locs, coord_scale, component_logits),
                obs=data,
            )

    def hand_model():
        locs = pyro.param("locs")
        coord_scale = pyro.param("coord_scale")
        component_logits = pyro.param("component_logits")
        with pyro.plate("data", len(data), dim=-2):
            which = pyro.sample(
                "mask",
                dist.Categorical(logits=component_logits),
                infer={"enumerate": "parallel"},
            )
            with pyro.plate(
                "components", len(component_logits), dim=-1
            ) as component_ind:
                with poutine.mask(mask=(which == component_ind)):
                    pyro.sample(
                        "obs",
                        dist.Normal(locs, coord_scale).to_event(1),
                        obs=data[:, None, :],
                    )

    def guide():
        pass

    elbo = TraceEnum_ELBO(max_plate_nesting=2)
    auto_loss, auto_grads = _loss_and_grads(elbo, auto_model, guide)
    hand_loss, hand_grads = _loss_and_grads(elbo, hand_model, guide)
    np.testing.assert_allclose(auto_loss, hand_loss, rtol=1e-4, atol=1e-5)
    for name in auto_grads:
        np.testing.assert_allclose(
            auto_grads[name], hand_grads[name], rtol=1e-3, atol=1e-4,
            err_msg=name,
        )
