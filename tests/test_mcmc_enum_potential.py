"""Exact log-marginals of the enumerated MCMC potential (ports the
reference's ``tests/infer/mcmc/test_valid_models.py`` evaluator tests):
the potential used by HMC/NUTS must equal the hand-computed
log p(continuous, obs) with all discrete sites summed out.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions.transforms import biject_to
from pyro_tpu.infer.mcmc.util import get_potential_fn


def _log_joint_at(model, values, args=(), max_plate_nesting=None):
    """-potential minus the change-of-variables Jacobian at ``values``
    (constrained) == log p(values, obs) with discretes marginalized."""
    potential_fn, _, transforms, _, _ = get_potential_fn(
        model, args, max_plate_nesting=max_plate_nesting
    )
    z = {}
    ladj = 0.0
    for name, v in values.items():
        t = transforms[name]
        u = t.inv(jnp.asarray(v))
        z[name] = u
        ladj = ladj + jnp.sum(t.log_abs_det_jacobian(u, jnp.asarray(v)))
    return float(-potential_fn(z) - ladj)


@pytest.mark.parametrize(
    "data,expected",
    [
        ([1.0], -1.3434),
        ([0.0], -1.4189),
        ([1.0, 0.0, 0.0], -4.1813),
    ],
    ids=str,
)
def test_enum_log_prob_continuous_observed(data, expected):
    def model(data):
        p = pyro.sample("p", dist.Uniform(0.0, 1.0))
        y = pyro.sample("y", dist.Bernoulli(p))
        q = 0.5 + 0.25 * y
        with pyro.plate("data", len(data)):
            z = pyro.sample("z", dist.Bernoulli(q))
            pyro.sample("obs", dist.Normal(2 * z - 1, 1.0), obs=data)

    data = jnp.asarray(data)
    actual = _log_joint_at(
        model, {"p": 0.4}, args=(data,), max_plate_nesting=1
    )
    np.testing.assert_allclose(actual, expected, atol=1e-3)


def test_all_discrete_marginalize_to_zero():
    """All-Bernoulli model, fully enumerated: the marginal is exactly 1
    (log 0) regardless of plate structure — but HMC needs a continuous
    site, so add an observed-only continuous anchor and check the
    marginal equals its log prob alone."""

    def model():
        s = pyro.sample("s", dist.Normal(0.0, 1.0))
        d = dist.Bernoulli(0.3)
        with pyro.plate("outer", 2, dim=-1):
            pyro.sample("x", d)
            with pyro.plate("inner1", 1, dim=-2):
                pyro.sample("y", d)
            with pyro.plate("inner2", 1, dim=-3):
                pyro.sample("z", d)

    actual = _log_joint_at(model, {"s": 0.7}, max_plate_nesting=3)
    expected = float(dist.Normal(0.0, 1.0).log_prob(jnp.asarray(0.7)))
    np.testing.assert_allclose(actual, expected, atol=1e-5)


def test_enum_log_prob_matches_brute_force():
    """Random two-latent chain inside a plate vs brute-force sum."""

    def model(data):
        p = pyro.sample("p", dist.Beta(2.0, 2.0))
        y = pyro.sample("y", dist.Bernoulli(p))
        with pyro.plate("data", len(data)):
            z = pyro.sample("z", dist.Bernoulli(0.2 + 0.6 * y))
            pyro.sample("obs", dist.Normal(z, 0.5), obs=data)

    data = jnp.asarray([0.3, -0.2])
    p0 = 0.35
    actual = _log_joint_at(
        model, {"p": p0}, args=(data,), max_plate_nesting=1
    )

    # brute force: sum over y and each z_i
    lp_p = float(dist.Beta(2.0, 2.0).log_prob(jnp.asarray(p0)))
    total = -np.inf
    for y in (0.0, 1.0):
        lp_y = float(dist.Bernoulli(p0).log_prob(jnp.asarray(y)))
        per_datum = 0.0
        for x in np.asarray(data):
            m = -np.inf
            for z in (0.0, 1.0):
                lp_z = float(
                    dist.Bernoulli(0.2 + 0.6 * y).log_prob(jnp.asarray(z))
                )
                lp_o = float(
                    dist.Normal(z, 0.5).log_prob(jnp.asarray(x))
                )
                m = np.logaddexp(m, lp_z + lp_o)
            per_datum += m
        total = np.logaddexp(total, lp_y + per_datum)
    expected = lp_p + total
    np.testing.assert_allclose(actual, expected, rtol=1e-5)
