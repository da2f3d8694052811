"""Straight-through relaxed distributions.

Port of ``/root/reference/tests/distributions/test_relaxed_straight_through.py``:
samples are quantized, ``log_prob`` scores the unquantized sample, and the
straight-through entropy gradient matches the fully-relaxed estimator in
expectation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.optim import Adam

ONEHOT_PROBS = [
    [0.25, 0.75],
    [0.25, 0.5, 0.25],
    [[0.25, 0.75], [0.75, 0.25]],
    [[[0.25, 0.75]], [[0.75, 0.25]]],
    [0.1] * 10,
]

BERN_PROBS = [[0.25, 0.75], [[0.25, 0.75], [0.75, 0.25]]]


@pytest.mark.parametrize("probs", ONEHOT_PROBS)
def test_onehot_shapes(probs):
    probs = jnp.asarray(probs)
    key = jax.random.PRNGKey(0)

    def entropy_term(p):
        d = dist.RelaxedOneHotCategoricalStraightThrough(0.5, probs=p)
        return d.log_prob(d.rsample(key)).sum()

    value = dist.RelaxedOneHotCategoricalStraightThrough(0.5, probs=probs).rsample(key)
    # samples are quantized one-hot vectors
    assert np.allclose(np.sort(np.asarray(value).reshape(-1, probs.shape[-1])),
                       np.sort(np.eye(probs.shape[-1])[np.argmax(value, -1).reshape(-1)], ), atol=0)
    grad_probs = jax.grad(entropy_term)(probs)
    assert grad_probs.shape == probs.shape
    assert np.isfinite(np.asarray(grad_probs)).all()


@pytest.mark.parametrize("temp", [0.3, 0.5, 1.0])
def test_onehot_entropy_grad(temp):
    num_samples = 1_000_000
    q = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    key = jax.random.PRNGKey(42)

    @jax.jit
    def grad_relaxed(q):
        def f(q):
            d = dist.RelaxedOneHotCategorical(jnp.asarray(temp), probs=q)
            z = d.rsample(key, (num_samples,))
            return d.log_prob(z).sum() / num_samples

        return jax.grad(f)(q)

    @jax.jit
    def grad_st(q):
        def f(q):
            d = dist.RelaxedOneHotCategoricalStraightThrough(
                jnp.asarray(temp), probs=q
            )
            z = d.rsample(key, (num_samples,))
            return d.log_prob(z).sum() / num_samples

        return jax.grad(f)(q)

    expected = np.asarray(grad_relaxed(q))
    actual = np.asarray(grad_st(q))
    assert np.abs(expected - actual).max() < 0.08, (expected, actual)


@pytest.mark.parametrize("probs", BERN_PROBS)
def test_bernoulli_shapes(probs):
    probs = jnp.asarray(probs)
    key = jax.random.PRNGKey(0)

    def entropy_term(p):
        d = dist.RelaxedBernoulliStraightThrough(0.5, probs=p)
        return d.log_prob(d.rsample(key)).sum()

    value = dist.RelaxedBernoulliStraightThrough(0.5, probs=probs).rsample(key)
    assert set(np.unique(np.asarray(value))) <= {0.0, 1.0}
    grad_probs = jax.grad(entropy_term)(probs)
    assert grad_probs.shape == probs.shape
    assert np.isfinite(np.asarray(grad_probs)).all()


@pytest.mark.parametrize("temp", [0.5, 1.0])
def test_bernoulli_entropy_grad(temp):
    num_samples = 1_000_000
    q = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    key = jax.random.PRNGKey(7)

    @jax.jit
    def grads(q):
        def f_relaxed(q):
            d = dist.RelaxedBernoulli(jnp.asarray(temp), probs=q)
            z = d.rsample(key, (num_samples,))
            return d.log_prob(z).sum() / num_samples

        def f_st(q):
            d = dist.RelaxedBernoulliStraightThrough(jnp.asarray(temp), probs=q)
            z = d.rsample(key, (num_samples,))
            return d.log_prob(z).sum() / num_samples

        return jax.grad(f_relaxed)(q), jax.grad(f_st)(q)

    expected, actual = map(np.asarray, grads(q))
    assert np.abs(expected - actual).max() < 0.04, (expected, actual)


def test_unquantize_cache_identity():
    """log_prob(rsample()) scores the soft value, not the hard vertex."""
    key = jax.random.PRNGKey(3)
    d = dist.RelaxedOneHotCategoricalStraightThrough(
        0.5, probs=jnp.asarray([0.1, 0.2, 0.3, 0.4])
    )
    z = d.rsample(key)
    lp_cached = d.log_prob(z)
    # a copied array misses the cache and is scored as given (ref getattr
    # fallback): at a clamped one-hot vertex the density is far from the
    # soft-sample density
    lp_hard = d.log_prob(jnp.array(np.asarray(z)))
    assert np.isfinite(float(lp_cached))
    assert not np.allclose(float(lp_cached), float(lp_hard))


@pytest.mark.parametrize("family", ["bernoulli", "onehot"])
def test_fresh_instance_scores_soft(family):
    """A *fresh* instance (never sampled from) scores the soft sample —
    value-attached semantics matching the reference's ``_unquantize``
    tensor attribute (``relaxed_straight_through.py:40-42``)."""
    key = jax.random.PRNGKey(11)
    temp = jnp.asarray(0.4)
    if family == "bernoulli":
        q = jnp.asarray([0.2, 0.7, 0.5])
        p = jnp.asarray([0.6, 0.3, 0.5])
        ST, Relaxed = dist.RelaxedBernoulliStraightThrough, dist.RelaxedBernoulli
    else:
        q = jnp.asarray([0.1, 0.2, 0.3, 0.4])
        p = jnp.asarray([0.4, 0.3, 0.2, 0.1])
        ST = dist.RelaxedOneHotCategoricalStraightThrough
        Relaxed = dist.RelaxedOneHotCategorical

    z = ST(temp, probs=q).rsample(key)
    # reconstruct the soft sample independently: same key, same base path
    from pyro_tpu.distributions.util import clamp_probs

    soft = clamp_probs(Relaxed(temp, probs=q).rsample(key))
    fresh = ST(temp, probs=p)
    expected = Relaxed(temp, probs=p).log_prob(soft)
    np.testing.assert_allclose(
        np.asarray(fresh.log_prob(z)), np.asarray(expected), rtol=1e-6
    )
    # and the hard vertex would have scored very differently
    hard_scored = Relaxed(temp, probs=p).log_prob(clamp_probs(z))
    assert not np.allclose(np.asarray(expected), np.asarray(hard_scored))


def test_fresh_instance_scores_soft_in_elbo():
    """Model-side scoring of a guide-drawn ST sample inside the Trace_ELBO
    trace/replay path uses the soft sample even though the model's
    distribution instance never sampled (the silent ELBO corruption from
    the round-3 verdict)."""
    from pyro_tpu import poutine
    from pyro_tpu.distributions.util import clamp_probs

    temp = jnp.asarray(0.4)
    q = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    p = jnp.asarray([0.4, 0.3, 0.2, 0.1])

    def model():
        pyro.sample(
            "z",
            dist.RelaxedOneHotCategoricalStraightThrough(temp, probs=p),
        )

    def guide():
        pyro.sample(
            "z",
            dist.RelaxedOneHotCategoricalStraightThrough(temp, probs=q),
        )

    guide_trace = poutine.trace(poutine.seed(guide, 5)).get_trace()
    model_trace = poutine.trace(
        poutine.replay(model, trace=guide_trace)
    ).get_trace()
    model_trace.compute_log_prob()
    z = guide_trace.nodes["z"]["value"]
    # the model-side log_prob must equal the base density at the soft
    # sample recovered from the value registry, not at the hard vertex
    from pyro_tpu.distributions.extra import _UNQUANTIZE

    soft = _UNQUANTIZE.lookup(z)
    assert soft is not z, "guide-drawn value lost its soft attachment"
    expected = dist.RelaxedOneHotCategorical(temp, probs=p).log_prob(soft)
    np.testing.assert_allclose(
        np.asarray(model_trace.nodes["z"]["log_prob"]),
        np.asarray(expected),
        rtol=1e-6,
    )
    hard_scored = dist.RelaxedOneHotCategorical(temp, probs=p).log_prob(
        clamp_probs(z)
    )
    assert not np.allclose(np.asarray(expected), np.asarray(hard_scored))


def test_onehot_svi_usage():
    """Ref test_relaxed_straight_through.py::test_onehot_svi_usage — the ST
    estimator recovers the uniform posterior."""

    def model():
        p = jnp.asarray([0.25] * 4)
        pyro.sample("z", dist.OneHotCategorical(probs=p))

    def guide():
        q = pyro.param(
            "q", jnp.asarray([0.1, 0.2, 0.3, 0.4]), constraint=constraints.simplex
        )
        pyro.sample(
            "z",
            dist.RelaxedOneHotCategoricalStraightThrough(
                temperature=jnp.asarray(0.10), probs=q
            ),
        )

    # lr 2e-3 / 10k steps rather than the reference's 1e-3 / 6k: the
    # stick-breaking simplex parameterization preconditions differently
    adam = Adam({"lr": 0.002, "betas": (0.95, 0.999)})
    svi = SVI(model, guide, adam, loss=Trace_ELBO())
    svi.run_steps(10000, rng_key=jax.random.PRNGKey(0))

    q = np.asarray(pyro.param("q"))
    assert np.abs(q - 0.25).max() < 0.025, q
