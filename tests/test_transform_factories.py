"""Helper-factory sweep over the transforms catalog (the lowercase
exports; mirrors the reference's smoke coverage in
``tests/distributions/test_transforms.py``): each factory builds, pushes
samples through a TransformedDistribution, yields finite log_prob, and —
when invertible — round-trips.

Conditional factories are exercised through ConditionalTransformedDistribution
with a random context vector.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
import pyro_tpu.distributions.transforms as T

DIM = 4
CTX = 3

FACTORY_CASES = [
    ("affine_autoregressive", lambda: T.affine_autoregressive("aa", DIM)),
    ("affine_coupling", lambda: T.affine_coupling("ac", DIM)),
    ("batchnorm", lambda: T.batchnorm("bn", DIM)),
    ("block_autoregressive", lambda: T.block_autoregressive("ba", DIM)),
    ("householder", lambda: T.householder("hh", DIM, count_transforms=2)),
    ("matrix_exponential", lambda: T.matrix_exponential("me", DIM)),
    ("neural_autoregressive", lambda: T.neural_autoregressive("na", DIM)),
    ("permute", lambda: T.permute(jnp.asarray([2, 0, 3, 1]))),
    ("planar", lambda: T.planar("pl", DIM)),
    ("polynomial", lambda: T.polynomial("po", DIM)),
    ("radial", lambda: T.radial("ra", DIM)),
    ("spline", lambda: T.spline("sp", DIM)),
    ("spline_autoregressive", lambda: T.spline_autoregressive("sa", DIM)),
    ("spline_coupling", lambda: T.spline_coupling("sc", DIM)),
    ("sylvester", lambda: T.sylvester("sy", DIM)),
    (
        "iterated",
        lambda: T.iterated(2, T.planar, "it", DIM),
    ),
    ("elu", lambda: T.elu()),
    ("leaky_relu", lambda: T.leaky_relu()),
]


@pytest.mark.parametrize(
    "name,factory", FACTORY_CASES, ids=[c[0] for c in FACTORY_CASES]
)
def test_factory_transformed_distribution(name, factory):
    t = factory()
    base = dist.Normal(jnp.zeros(DIM), jnp.ones(DIM)).to_event(1)
    # with_cache: forward-only flows (planar, radial, sylvester, ...)
    # are scored at their own samples via the (x, y) memo, exactly how
    # AutoNormalizingFlow uses them
    flowed = dist.TransformedDistribution(base, [t.with_cache()])
    x = flowed.sample(jax.random.key(len(name)), (7,))
    assert x.shape == (7, DIM)
    lp = flowed.log_prob(x)
    assert lp.shape == (7,)
    assert np.isfinite(np.asarray(lp)).all(), name


@pytest.mark.parametrize(
    "name,factory",
    [c for c in FACTORY_CASES if c[0] in (
        "affine_autoregressive", "affine_coupling", "householder",
        "permute", "spline", "spline_coupling", "elu", "leaky_relu",
    )],
    ids=lambda c: c if isinstance(c, str) else "",
)
def test_factory_inverse_roundtrip(name, factory):
    t = factory()
    y = jax.random.normal(jax.random.key(1), (5, DIM)) * 0.7
    if name in ("elu", "leaky_relu"):
        y = jnp.abs(y) + 0.1  # codomain of elu/leaky_relu forward
        x = t.inv(y)
        y2 = t(x)
    else:
        x = t.inv(y)
        y2 = t(x)
    assert np.allclose(np.asarray(y2), np.asarray(y), atol=1e-3), name


CONDITIONAL_CASES = [
    (
        "conditional_affine_autoregressive",
        lambda: T.conditional_affine_autoregressive("caa", DIM, CTX),
    ),
    (
        "conditional_affine_coupling",
        lambda: T.conditional_affine_coupling("cac", DIM, CTX),
    ),
    (
        "conditional_householder",
        lambda: T.conditional_householder("chh", DIM, CTX),
    ),
    (
        "conditional_matrix_exponential",
        lambda: T.conditional_matrix_exponential("cme", DIM, CTX),
    ),
    (
        "conditional_neural_autoregressive",
        lambda: T.conditional_neural_autoregressive("cna", DIM, CTX),
    ),
    (
        "conditional_planar",
        lambda: T.conditional_planar("cpl", DIM, CTX),
    ),
    (
        "conditional_radial",
        lambda: T.conditional_radial("cra", DIM, CTX),
    ),
    (
        "conditional_spline",
        lambda: T.conditional_spline("csp", DIM, CTX),
    ),
    (
        "conditional_spline_autoregressive",
        lambda: T.conditional_spline_autoregressive("csa", DIM, CTX),
    ),
]


@pytest.mark.parametrize(
    "name,factory", CONDITIONAL_CASES, ids=[c[0] for c in CONDITIONAL_CASES]
)
def test_conditional_factory(name, factory):
    t = factory()
    # anisotropic base so volume-preserving flows (householder) still
    # change the density when the context rotates them
    scales = jnp.asarray([0.5, 1.0, 1.5, 2.0])
    base = dist.Normal(jnp.zeros(DIM), scales).to_event(1)
    cond = dist.ConditionalTransformedDistribution(base, [t])
    ctx = jax.random.normal(jax.random.key(0), (CTX,))
    d = cond.condition(ctx)
    x = d.sample(jax.random.key(len(name)), (5,))
    assert x.shape == (5, DIM)
    # scoring the *own* sample works even for forward-only flows
    # (planar, radial, ...) via the with_cache (x, y) memo — same
    # contract as the reference's cache_size=1 flows
    lp = d.log_prob(x)
    assert np.isfinite(np.asarray(lp)).all(), name
    # different context -> different pushforward (conditioning is real):
    # same base randomness, different transform output.  (Scoring an
    # arbitrary point under a different context is impossible for
    # forward-only flows in the reference too — cache miss raises.)
    d2 = cond.condition(ctx + 1.0)
    x2 = d2.sample(jax.random.key(len(name)), (5,))
    assert not np.allclose(np.asarray(x), np.asarray(x2)), name
