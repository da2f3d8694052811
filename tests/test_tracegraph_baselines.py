"""TraceGraph_ELBO baseline behavior and gradient-variance tests.

Mirrors the reference's ``tests/infer/test_tracegraph_elbo.py``: exact
gradients on conjugate models, and the variance-reduction contract of
decaying-average / NVIL baselines for non-reparameterized sites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import SVI, Trace_ELBO, TraceGraph_ELBO
from pyro_tpu.infer.svi import ParamsMessenger
from pyro_tpu.optim import Adam


def _grad_samples(elbo, model, guide, n, seed=0):
    """Per-sample ELBO gradients w.r.t. all params, as a dict of stacked
    arrays (one jitted grad per key)."""
    pyro.clear_param_store()
    pyro.set_rng_seed(seed)
    # materialize params
    elbo.loss(model, guide, rng_key=jax.random.key(seed))
    store = pyro.get_param_store()
    params = store.get_all_unconstrained()

    def loss_fn(params, key):
        with ParamsMessenger(params, store):
            return elbo.differentiable_loss(model, guide, rng_key=key)

    gfn = jax.jit(jax.grad(loss_fn))
    keys = jax.random.split(jax.random.key(seed + 1), n)
    grads = [gfn(params, k) for k in keys]
    return {
        name: jnp.stack([g[name] for g in grads]) for name in params
    }


def test_nonreparam_gradient_unbiased():
    """Score-function gradient of a Bernoulli latent matches the exact
    analytic ELBO gradient in expectation."""
    p_model = 0.4

    def model():
        pyro.sample("z", dist.Bernoulli(p_model))

    def guide():
        q = pyro.param("q", jnp.asarray(0.55))
        pyro.sample("z", dist.Bernoulli(q))

    # exact: d/dq KL(q || p) with Bernoulli(q) guide
    def exact_grad(q):
        return float(
            jax.grad(
                lambda q: q * (jnp.log(q) - jnp.log(p_model))
                + (1 - q)
                * (jnp.log(1 - q) - jnp.log(1 - p_model))
            )(q)
        )

    grads = _grad_samples(
        TraceGraph_ELBO(), model, guide, n=2000
    )["q"]
    actual = float(jnp.mean(grads))
    expected = exact_grad(jnp.asarray(0.55))
    # MC error ~ std/sqrt(n)
    tol = 4 * float(jnp.std(grads)) / np.sqrt(2000)
    assert abs(actual - expected) < max(tol, 0.02), (actual, expected)


@pytest.mark.stage("integration")
def test_decaying_avg_baseline_reduces_variance():
    """The decaying-average baseline must reduce score-function gradient
    variance on a model with a large constant downstream cost."""
    data = jnp.asarray(5.0)

    def make_pair(use_baseline):
        infer = (
            {
                "baseline": {
                    "use_decaying_avg_baseline": True,
                    "baseline_beta": 0.9,
                }
            }
            if use_baseline
            else {}
        )

        def model():
            z = pyro.sample("z", dist.Bernoulli(0.5), infer=infer)
            # large downstream cost inflates the score-function term
            pyro.sample(
                "obs", dist.Normal(z, 0.5), obs=data
            )

        def guide():
            q = pyro.param("q", jnp.asarray(0.5))
            pyro.sample("z", dist.Bernoulli(q), infer=infer)

        return model, guide

    n = 300

    def variance(use_baseline):
        model, guide = make_pair(use_baseline)
        elbo = TraceGraph_ELBO()
        pyro.clear_param_store()
        pyro.set_rng_seed(0)
        elbo.loss(model, guide, rng_key=jax.random.key(0))
        store = pyro.get_param_store()
        params = store.get_all_unconstrained()

        # discover the baseline-state structure with one eager eval, then
        # thread it functionally, exactly as SVI's jitted update does
        elbo.differentiable_loss(
            model, guide, rng_key=jax.random.key(9), loss_state={}
        )
        state = elbo.pop_loss_state()

        def loss_fn(params, key, state):
            with ParamsMessenger(params, store):
                loss = elbo.differentiable_loss(
                    model, guide, rng_key=key, loss_state=state
                )
            return loss, elbo.pop_loss_state()

        gfn = jax.jit(jax.grad(loss_fn, has_aux=True))
        # warm the running baseline before measuring
        keys = jax.random.split(jax.random.key(1), n + 100)
        grads = []
        for i, k in enumerate(keys):
            g, state = gfn(params, k, state)
            if i >= 100:
                grads.append(float(g["q"]))
        return float(np.var(grads))

    v_without = variance(False)
    v_with = variance(True)
    assert v_with < 0.5 * v_without, (v_with, v_without)


@pytest.mark.stage("integration")
def test_nvil_baseline_value_trains():
    """A learned NVIL baseline (baseline_value from a param) receives
    gradient updates through the auxiliary MSE loss and moves toward the
    mean downstream cost."""
    data = jnp.asarray(3.0)

    def model():
        z = pyro.sample("z", dist.Bernoulli(0.5))
        pyro.sample("obs", dist.Normal(z, 1.0), obs=data)

    def guide():
        b = pyro.param("baseline_b", jnp.asarray(0.0))
        q = pyro.param("q", jnp.asarray(0.5))
        pyro.sample(
            "z",
            dist.Bernoulli(q),
            infer={"baseline": {"baseline_value": b}},
        )

    pyro.clear_param_store()
    pyro.set_rng_seed(0)
    svi = SVI(model, guide, Adam({"lr": 0.1}), TraceGraph_ELBO())
    for _ in range(200):
        svi.step()
    b = float(pyro.param("baseline_b"))
    # downstream cost is ~ -log N(3 | z, 1) + KL terms, clearly nonzero
    assert abs(b) > 0.5, b


def test_tracegraph_matches_trace_for_reparam():
    """With only reparameterized sites, TraceGraph_ELBO and Trace_ELBO
    compute identical surrogate gradients."""
    data = jnp.asarray([0.5, 1.5, -0.2])

    def model():
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        with pyro.plate("data", 3):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide():
        q = pyro.param("q_loc", jnp.asarray(0.1))
        s = pyro.param("q_scale", jnp.asarray(0.5))
        pyro.sample("loc", dist.Normal(q, jnp.abs(s)))

    g1 = _grad_samples(Trace_ELBO(), model, guide, n=20, seed=3)
    g2 = _grad_samples(TraceGraph_ELBO(), model, guide, n=20, seed=3)
    for name in g1:
        assert np.allclose(
            np.asarray(g1[name]), np.asarray(g2[name]), atol=1e-5
        ), name
