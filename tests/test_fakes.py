"""Score-function (REINFORCE) gradient path, forced via the fakes module
(ref ``pyro/distributions/testing/fakes.py:7-19`` and its use across
``tests/infer/test_gradient.py``): Nonreparameterized* distributions are
exact copies with ``has_rsample = False``, so every ELBO must fall back
to the score-function estimator and still (a) be unbiased and
(b) converge on conjugate problems.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions.testing.fakes import (
    NonreparameterizedBeta,
    NonreparameterizedDirichlet,
    NonreparameterizedGamma,
    NonreparameterizedNormal,
)
from pyro_tpu.infer import SVI, Trace_ELBO, TraceGraph_ELBO
from pyro_tpu.optim import Adam


@pytest.mark.parametrize(
    "fake,args",
    [
        (NonreparameterizedNormal, (0.3, 1.2)),
        (NonreparameterizedBeta, (2.0, 3.0)),
        (NonreparameterizedGamma, (2.5, 1.0)),
        (NonreparameterizedDirichlet, (jnp.asarray([2.0, 3.0, 1.0]),)),
    ],
    ids=["Normal", "Beta", "Gamma", "Dirichlet"],
)
def test_fakes_force_score_function(fake, args):
    """The fake matches its base pointwise but routes ScoreParts onto the
    score-function term instead of the pathwise (entropy) term."""
    from pyro_tpu.infer.util import is_identically_zero

    d = fake(*args)
    base = type(d).__mro__[1](*args)
    assert not d.has_rsample and base.has_rsample
    x = d.sample(jax.random.key(0), (7,))
    assert np.allclose(
        np.asarray(d.log_prob(x)), np.asarray(base.log_prob(x)), atol=1e-6
    )
    parts = d.score_parts(x)
    assert not is_identically_zero(parts.score_function)
    base_parts = base.score_parts(x)
    assert is_identically_zero(base_parts.score_function)


def test_score_function_gradient_unbiased():
    """E[REINFORCE gradient] equals the exact ELBO gradient (here computed
    analytically for Normal q against Normal prior + Normal likelihood)."""
    data = jnp.asarray(2.0)

    def surrogate(loc, key, n=20000):
        """Mean score-function surrogate gradient over n draws."""

        def one(k):
            q = NonreparameterizedNormal(loc, 1.0)
            x = q.sample(k)
            x = jax.lax.stop_gradient(x)
            log_r = (
                dist.Normal(0.0, 1.0).log_prob(x)
                + dist.Normal(x, 1.0).log_prob(data)
                - dist.Normal(loc, 1.0).log_prob(x)
            )
            return jax.lax.stop_gradient(log_r) * dist.Normal(
                loc, 1.0
            ).log_prob(x)

        keys = jax.random.split(key, n)
        return jnp.mean(jax.vmap(one)(keys))

    g = jax.grad(lambda l: surrogate(l, jax.random.key(0)))(0.5)
    # exact: d/dloc E_q[log p - log q] with q = N(loc, 1):
    #   E[log p(x) + log p(data|x)] = -0.5 loc^2 - 0.5 (data-loc)^2 + const
    #   entropy of q is loc-free, so grad = -loc + (data - loc)
    exact = -0.5 + (2.0 - 0.5)
    assert abs(float(g) - exact) < 0.08, (float(g), exact)


@pytest.mark.stage("integration")
@pytest.mark.parametrize("elbo_cls", [Trace_ELBO, TraceGraph_ELBO])
def test_nonreparam_normal_converges(elbo_cls):
    """Conjugate Normal posterior is recovered through the pure
    score-function path (higher variance: more particles, looser tol)."""
    pyro.clear_param_store()
    data = jnp.array([1.0, 2.0, 3.0])

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 10.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    def guide(data):
        loc = pyro.param("guide_loc", 0.0)
        scale = pyro.param(
            "guide_scale", 1.0, constraint=dist.constraints.positive
        )
        pyro.sample("loc", NonreparameterizedNormal(loc, scale))

    svi = SVI(
        model, guide, Adam({"lr": 0.03}), elbo_cls(num_particles=32)
    )
    svi.run_steps(3000, data)
    post_var = 1.0 / (1.0 / 100.0 + 3.0)
    post_loc = post_var * float(jnp.sum(data))
    store = pyro.get_param_store()
    assert np.allclose(store["guide_loc"], post_loc, atol=0.25)
    assert np.allclose(store["guide_scale"], post_var**0.5, atol=0.25)


@pytest.mark.stage("integration")
def test_nonreparam_beta_bernoulli_converges():
    """Beta-Bernoulli conjugate pair through NonreparameterizedBeta."""
    pyro.clear_param_store()
    data = jnp.array([1.0, 1.0, 1.0, 0.0, 1.0, 1.0, 0.0, 1.0])

    def model(data):
        p = pyro.sample("p", dist.Beta(2.0, 2.0))
        with pyro.plate("data", data.shape[0]):
            pyro.sample("obs", dist.Bernoulli(p), obs=data)

    def guide(data):
        a = pyro.param(
            "a", 2.0, constraint=dist.constraints.positive
        )
        b = pyro.param(
            "b", 2.0, constraint=dist.constraints.positive
        )
        pyro.sample("p", NonreparameterizedBeta(a, b))

    svi = SVI(
        model, guide, Adam({"lr": 0.03}), Trace_ELBO(num_particles=32)
    )
    svi.run_steps(3000, data)
    store = pyro.get_param_store()
    # true posterior Beta(2 + 6, 2 + 2); compare moments, not raw params
    a, b = float(store["a"]), float(store["b"])
    mean, true_mean = a / (a + b), 8.0 / 12.0
    assert abs(mean - true_mean) < 0.07, (a, b)
