"""Non-mean-field enumerated-guide gradient correctness.

The guide has *intra-guide* dependencies on an enumerated (or sampled)
discrete latent — the estimator must account for downstream guide terms
through the enumeration weighting.  Gradients are checked against
closed-form KL expressions differentiated with ``jax.grad``.

Mirrors the reference's ``tests/infer/test_enum.py``
``test_non_mean_field_{bern_bern,bern_normal,normal_bern}_elbo_gradient``
(ref test_enum.py:1283-1495).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions import kl_divergence
from pyro_tpu.infer import TraceEnum_ELBO, config_enumerate
from pyro_tpu.infer.svi import ParamsMessenger


def _mean_param_grads(elbo, model, guide, key):
    """Gradient of the surrogate loss w.r.t. raw (unconstrained) params."""
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(p, k):
        with ParamsMessenger(p, store):
            return elbo.differentiable_loss(model, guide, rng_key=k)

    return jax.jit(jax.grad(loss_fn))(params, key)


@pytest.mark.parametrize("enumerate1", [None, "sequential", "parallel"])
@pytest.mark.parametrize("pi1", [0.33, 0.43])
@pytest.mark.parametrize("pi2", [0.55, 0.27])
def test_non_mean_field_bern_bern_elbo_gradient(enumerate1, pi1, pi2):
    pyro.clear_param_store()
    num_particles = 1 if enumerate1 else 20000

    def model():
        with pyro.plate("particles", num_particles):
            y = pyro.sample(
                "y", dist.Bernoulli(0.33).expand_by([num_particles])
            )
            pyro.sample("z", dist.Bernoulli(0.55 * y + 0.10))

    def guide():
        q1 = pyro.param("q1", jnp.asarray(pi1))
        q2 = pyro.param("q2", jnp.asarray(pi2))
        with pyro.plate("particles", num_particles):
            y = pyro.sample(
                "y", dist.Bernoulli(q1).expand_by([num_particles])
            )
            pyro.sample("z", dist.Bernoulli(q2 * y + 0.10))

    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    guide_ = config_enumerate(guide, default=enumerate1)
    guide_()  # materialize params
    grads = _mean_param_grads(elbo, model, guide_, jax.random.key(0))
    actual_q1 = np.asarray(grads["q1"]) / num_particles
    actual_q2 = np.asarray(grads["q2"]) / num_particles

    def neg_elbo(q):
        q1, q2 = q
        loss = kl_divergence(dist.Bernoulli(q1), dist.Bernoulli(0.33))
        loss = loss + q1 * kl_divergence(
            dist.Bernoulli(q2 + 0.10), dist.Bernoulli(0.65)
        )
        loss = loss + (1.0 - q1) * kl_divergence(
            dist.Bernoulli(0.10), dist.Bernoulli(0.10)
        )
        return loss

    expected_q1, expected_q2 = np.asarray(
        jax.grad(neg_elbo)(jnp.asarray([pi1, pi2]))
    )

    prec = 0.03 if enumerate1 is None else 0.001
    np.testing.assert_allclose(actual_q1, expected_q1, atol=prec, err_msg="q1")
    np.testing.assert_allclose(actual_q2, expected_q2, atol=prec, err_msg="q2")


@pytest.mark.parametrize("pi1", [0.33, 0.44])
@pytest.mark.parametrize("pi2", [0.55, 0.39])
@pytest.mark.parametrize("pi3", [0.22, 0.29])
@pytest.mark.parametrize(
    "enumerate1,num_samples",
    [
        (None, None),
        ("sequential", None),
        ("parallel", None),
        ("parallel", 2),
    ],
    ids=["mc", "sequential", "parallel", "parallel-2"],
)
def test_non_mean_field_bern_normal_elbo_gradient(
    enumerate1, pi1, pi2, pi3, num_samples
):
    """The model's param q3 appears both in the discrete prior and in the
    downstream Normal likelihood; the guide's q2 only downstream of the
    enumerated y (ref test_enum.py:1351-1438)."""
    pyro.clear_param_store()
    num_particles = 10000

    def model():
        q3 = pyro.param("q3", jnp.asarray(pi3))
        with pyro.plate("particles", num_particles):
            y = pyro.sample(
                "y", dist.Bernoulli(q3).expand_by([num_particles])
            )
            pyro.sample("z", dist.Normal(0.55 * y + q3, 1.0))

    def guide():
        q1 = pyro.param("q1", jnp.asarray(pi1))
        q2 = pyro.param("q2", jnp.asarray(pi2))
        with pyro.plate("particles", num_particles):
            y = pyro.sample(
                "y",
                dist.Bernoulli(q1).expand_by([num_particles]),
                infer={
                    "enumerate": enumerate1,
                    **(
                        {"num_samples": num_samples}
                        if num_samples is not None
                        else {}
                    ),
                },
            )
            pyro.sample("z", dist.Normal(q2 * y + 0.10, 1.0))

    model()  # materialize q3
    guide()
    elbo = TraceEnum_ELBO(max_plate_nesting=1)
    grads = _mean_param_grads(elbo, model, guide, jax.random.key(0))
    actual = {
        q: np.asarray(grads[q]) / num_particles for q in ("q1", "q2", "q3")
    }

    def neg_elbo(q):
        q1, q2, q3 = q
        loss = kl_divergence(dist.Bernoulli(q1), dist.Bernoulli(q3))
        loss = loss + q1 * kl_divergence(
            dist.Normal(q2 + 0.10, 1.0), dist.Normal(q3 + 0.55, 1.0)
        )
        loss = loss + (1.0 - q1) * kl_divergence(
            dist.Normal(0.10, 1.0), dist.Normal(q3, 1.0)
        )
        return loss

    expected = dict(
        zip(
            ("q1", "q2", "q3"),
            np.asarray(jax.grad(neg_elbo)(jnp.asarray([pi1, pi2, pi3]))),
        )
    )

    prec = 0.04 if enumerate1 is None or num_samples else 0.02
    for q in ("q1", "q2", "q3"):
        np.testing.assert_allclose(
            actual[q], expected[q], atol=prec, err_msg=q
        )


@pytest.mark.parametrize("pi1", [0.33, 0.41])
@pytest.mark.parametrize("pi2", [0.44, 0.17])
@pytest.mark.parametrize("pi3", [0.22, 0.29])
def test_non_mean_field_normal_bern_elbo_gradient(pi1, pi2, pi3):
    """A CONTINUOUS guide latent feeds the discrete site's probs: the
    enumerated estimators must agree with the plain Monte Carlo one
    (ref test_enum.py:1442-1495)."""

    def model(num_particles):
        q3 = pyro.param("q3", jnp.asarray(pi3))
        q4 = pyro.param("q4", jnp.asarray(0.5 * (pi1 + pi2)))
        with pyro.plate("particles", num_particles):
            z = pyro.sample(
                "z", dist.Normal(q3, 1.0).expand_by([num_particles])
            )
            zz = jax.nn.sigmoid(z)
            pyro.sample("y", dist.Bernoulli(q4 * zz))

    def guide(num_particles):
        q1 = pyro.param("q1", jnp.asarray(pi1))
        q2 = pyro.param("q2", jnp.asarray(pi2))
        with pyro.plate("particles", num_particles):
            z = pyro.sample(
                "z", dist.Normal(q2, 1.0).expand_by([num_particles])
            )
            zz = jax.nn.sigmoid(z)
            pyro.sample("y", dist.Bernoulli(q1 * zz))

    results = {}
    for ed, num_particles in zip(
        [None, "parallel", "sequential"], [50000, 20000, 20000]
    ):
        pyro.clear_param_store()
        guide_ = config_enumerate(guide, default=ed)
        model(num_particles)
        guide_(num_particles)
        store = pyro.get_param_store()
        params = store.get_all_unconstrained()
        elbo = TraceEnum_ELBO(max_plate_nesting=1)

        def loss_fn(p, k):
            with ParamsMessenger(p, store):
                return elbo.differentiable_loss(
                    model, guide_, num_particles, rng_key=k
                )

        grads = jax.jit(jax.grad(loss_fn))(params, jax.random.key(0))
        results[str(ed)] = {
            q: np.asarray(grads[q]) / num_particles
            for q in ("q1", "q2", "q3", "q4")
        }

    for ed in ("parallel", "sequential"):
        for q in ("q1", "q2", "q3", "q4"):
            np.testing.assert_allclose(
                results[ed][q],
                results["None"][q],
                atol=0.03,
                err_msg=f"{ed} {q}",
            )
