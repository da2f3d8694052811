"""biject_to / transform_to registry sweep over the constraints catalog
(mirrors the reference's ``tests/distributions/test_constraints.py`` +
the registry sections of ``test_transforms.py``):

  for every constraint: the registered bijection maps arbitrary
  unconstrained input INTO the support (``check`` passes), inverts back
  (roundtrip), and its log_abs_det_jacobian matches autodiff.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu.distributions as dist
from pyro_tpu.distributions import constraints
from pyro_tpu.distributions.transforms import biject_to, transform_to

# (name, constraint, unconstrained event shape fed to the bijection)
CASES = [
    ("real", constraints.real, ()),
    ("real_vector", constraints.real_vector, (4,)),
    ("positive", constraints.positive, ()),
    ("nonnegative", constraints.nonnegative, ()),
    ("negative", constraints.negative, ()),
    ("unit_interval", constraints.unit_interval, ()),
    ("interval", constraints.interval(-2.0, 5.0), ()),
    ("open_interval", constraints.open_interval(-1.0, 1.0), ()),
    ("greater_than", constraints.greater_than(3.0), ()),
    ("greater_than_eq", constraints.greater_than_eq(-1.0), ()),
    ("less_than", constraints.less_than(2.0), ()),
    ("simplex", constraints.simplex, (4,)),
    ("ordered_vector", constraints.ordered_vector, (4,)),
    (
        "positive_ordered_vector",
        constraints.positive_ordered_vector,
        (4,),
    ),
    ("lower_cholesky", constraints.lower_cholesky, (3, 3)),
    ("unit_lower_cholesky", constraints.unit_lower_cholesky, (3, 3)),
    ("corr_cholesky", constraints.corr_cholesky, (3, 3)),
    ("corr_matrix", constraints.corr_matrix, (3, 3)),
    ("positive_definite", constraints.positive_definite, (3, 3)),
    ("softplus_positive", constraints.softplus_positive, ()),
    (
        "softplus_lower_cholesky",
        constraints.softplus_lower_cholesky,
        (3, 3),
    ),
]

# surjections registered only in transform_to (no bijection exists)
TRANSFORM_ONLY_CASES = [
    ("sphere", constraints.sphere, (3,)),
]


def _unconstrained_input(t, event_shape, key):
    """Random unconstrained input with the domain event rank the
    transform expects."""
    dom_dim = getattr(t.domain, "event_dim", 0)
    if len(event_shape) >= 2:
        # matrix-valued codomains take a flat vector domain of the
        # parameter count, or a full matrix, depending on the transform
        try:
            n = event_shape[-1]
            probe = jnp.zeros(event_shape)
            t(probe)
            return jax.random.normal(key, event_shape) * 0.5
        except Exception:
            k = event_shape[-1]
            flat = (k * (k + 1)) // 2
            return jax.random.normal(key, event_shape[:-2] + (flat,)) * 0.5
    if dom_dim > 0 and not event_shape:
        return jax.random.normal(key, (4,)) * 0.5
    return jax.random.normal(key, event_shape) * 0.5


@pytest.mark.parametrize(
    "name,constraint,shape", CASES, ids=[c[0] for c in CASES]
)
@pytest.mark.parametrize("registry", [biject_to, transform_to], ids=["biject", "transform"])
def test_registry_maps_into_support(name, constraint, shape, registry):
    t = registry(constraint)
    key = jax.random.key(abs(hash(name)) % 2**31)
    x = _unconstrained_input(t, shape, key)
    y = t(x)
    ok = constraint.check(y)
    assert bool(jnp.all(ok)), (name, np.asarray(y))


@pytest.mark.parametrize(
    "name,constraint,shape", CASES, ids=[c[0] for c in CASES]
)
def test_biject_roundtrip(name, constraint, shape):
    t = biject_to(constraint)
    key = jax.random.key(abs(hash(name)) % 2**31)
    x = _unconstrained_input(t, shape, key)
    y = t(x)
    x2 = t.inv(y)
    y2 = t(x2)
    # y -> x -> y must be exact-ish even when x -> y loses information
    assert np.allclose(np.asarray(y2), np.asarray(y), atol=1e-4), name


SCALAR_LOGDET_CASES = [
    c for c in CASES if c[2] == () and c[0] != "real"
]


@pytest.mark.parametrize(
    "name,constraint,shape",
    SCALAR_LOGDET_CASES,
    ids=[c[0] for c in SCALAR_LOGDET_CASES],
)
def test_scalar_logdet_matches_autodiff(name, constraint, shape):
    t = biject_to(constraint)
    x = jnp.asarray(0.37)
    ld = t.log_abs_det_jacobian(x, t(x))
    grad = jax.grad(lambda v: t(v))(x)
    assert np.allclose(
        float(ld), float(jnp.log(jnp.abs(grad))), atol=1e-5
    ), name


@pytest.mark.parametrize(
    "name,constraint,shape",
    [c for c in CASES if c[0] in ("simplex", "ordered_vector", "positive_ordered_vector", "real_vector")],
    ids=lambda c: c if isinstance(c, str) else "",
)
def test_vector_logdet_matches_autodiff(name, constraint, shape):
    t = biject_to(constraint)
    x = jax.random.normal(jax.random.key(0), shape) * 0.5
    ld = t.log_abs_det_jacobian(x, t(x))
    J = jax.jacfwd(t)(x)
    # square part of the Jacobian (simplex drops one output dim)
    if J.shape[0] != J.shape[1]:
        J = J[: min(J.shape), : min(J.shape)]
    sign, logdet = jnp.linalg.slogdet(J)
    assert np.allclose(float(ld), float(logdet), atol=1e-4), (
        name,
        float(ld),
        float(logdet),
    )


def test_constraint_checks_reject_bad_values():
    assert not bool(constraints.positive.check(jnp.asarray(-1.0)))
    assert not bool(
        jnp.all(constraints.simplex.check(jnp.asarray([0.7, 0.7])))
    )
    bad_chol = jnp.asarray([[1.0, 0.5], [0.5, 1.0]])  # not lower-tri
    assert not bool(jnp.all(constraints.lower_cholesky.check(bad_chol)))
    assert not bool(
        jnp.all(
            constraints.ordered_vector.check(jnp.asarray([1.0, 0.5]))
        )
    )


def test_param_constraint_integration():
    """pyro.param applies registry transforms end-to-end."""
    import pyro_tpu as pyro

    pyro.clear_param_store()
    try:
        p = pyro.param(
            "chol",
            jnp.eye(3),
            constraint=constraints.lower_cholesky,
        )
        assert bool(jnp.all(constraints.lower_cholesky.check(p)))
        q = pyro.param(
            "simplex",
            jnp.ones(4) / 4,
            constraint=constraints.simplex,
        )
        assert np.allclose(np.asarray(q).sum(), 1.0, atol=1e-5)
    finally:
        pyro.clear_param_store()
