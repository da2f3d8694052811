"""Model-validity error matrix.

Mirrors ``/root/reference/tests/infer/test_valid_models.py``: tiny models
with deliberate shape/plate/name misuse are pushed through each ELBO and
the validation layer must respond (ok / warning / error) as documented.
"""

import warnings

import jax.numpy as jnp
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.infer import (
    SVI,
    Trace_ELBO,
    TraceEnum_ELBO,
    TraceGraph_ELBO,
    TraceMeanField_ELBO,
    config_enumerate,
)
from pyro_tpu.optim import Adam

ELBOS = [Trace_ELBO, TraceGraph_ELBO, TraceMeanField_ELBO]


def assert_ok(model, guide, elbo, **kwargs):
    """One SVI step must succeed (ref ``test_valid_models.py:assert_ok``)."""
    pyro.clear_param_store()
    SVI(model, guide, Adam({"lr": 1e-6}), elbo).step(**kwargs)


def assert_error(model, guide, elbo, match=None, **kwargs):
    """One SVI step must raise (ref ``assert_error``)."""
    pyro.clear_param_store()
    with pytest.raises(
        (ValueError, RuntimeError, KeyError, TypeError), match=match
    ):
        SVI(model, guide, Adam({"lr": 1e-6}), elbo).step(**kwargs)


def assert_warning(model, guide, elbo, match=None, **kwargs):
    """One SVI step must warn (ref ``assert_warning``)."""
    pyro.clear_param_store()
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        SVI(model, guide, Adam({"lr": 1e-6}), elbo).step(**kwargs)
        assert any(
            match is None or match in str(x.message) for x in w
        ), [str(x.message) for x in w]


@pytest.mark.parametrize("Elbo", ELBOS)
def test_nonempty_model_empty_guide_ok(Elbo):
    def model():
        pyro.sample("x", dist.Normal(0.0, 1.0), obs=jnp.array(0.5))

    def guide():
        pass

    assert_ok(model, guide, Elbo())


@pytest.mark.parametrize("Elbo", ELBOS)
def test_simple_model_guide_ok(Elbo):
    def model():
        pyro.sample("z", dist.Normal(0.0, 1.0))

    def guide():
        loc = pyro.param("loc", jnp.zeros(()))
        pyro.sample("z", dist.Normal(loc, 1.0))

    assert_ok(model, guide, Elbo())


@pytest.mark.parametrize("Elbo", ELBOS)
def test_variable_clash_in_model_error(Elbo):
    def model():
        pyro.sample("z", dist.Normal(0.0, 1.0))
        pyro.sample("z", dist.Normal(0.0, 1.0))  # duplicate name

    def guide():
        pyro.sample("z", dist.Normal(0.0, 1.0))

    assert_error(model, guide, Elbo(), match="Multiple")


@pytest.mark.parametrize("Elbo", ELBOS)
def test_extra_guide_site_warning(Elbo):
    def model():
        pyro.sample("z", dist.Normal(0.0, 1.0))

    def guide():
        pyro.sample("z", dist.Normal(0.0, 1.0))
        pyro.sample("extra", dist.Normal(0.0, 1.0))

    assert_warning(model, guide, Elbo(), match="not model")


@pytest.mark.parametrize("Elbo", ELBOS)
def test_observed_site_in_guide_warning(Elbo):
    data = jnp.array(0.3)

    def model():
        pyro.sample("z", dist.Normal(0.0, 1.0))
        pyro.sample("x", dist.Normal(0.0, 1.0), obs=data)

    def guide():
        pyro.sample("z", dist.Normal(0.0, 1.0))
        pyro.sample("x", dist.Normal(0.0, 1.0))

    assert_warning(model, guide, Elbo(), match="observed")


@pytest.mark.parametrize("Elbo", ELBOS)
def test_model_guide_shape_mismatch_error(Elbo):
    def model():
        pyro.sample(
            "z", dist.Normal(jnp.zeros(2), 1.0).to_event(1)
        )

    def guide():
        pyro.sample(
            "z", dist.Normal(jnp.zeros(3), 1.0).to_event(1)
        )

    assert_error(model, guide, Elbo())


@pytest.mark.parametrize("Elbo", ELBOS)
def test_unplated_batch_dim_error(Elbo):
    """A batched site outside any plate must be flagged
    (ref ``check_site_shape``)."""

    def model():
        # batch dim of size 2 with no plate and no .to_event()
        pyro.sample("z", dist.Normal(jnp.zeros(2), 1.0))

    def guide():
        pyro.sample("z", dist.Normal(jnp.zeros(2), 1.0))

    # an explicit max_plate_nesting is required to catch this (dims left
    # of the nesting are reserved for enumeration/particles)
    with pyro.validation_enabled():
        assert_error(
            model, guide, Elbo(max_plate_nesting=1), match="plate|to_event"
        )


@pytest.mark.parametrize("Elbo", ELBOS)
def test_plated_batch_dim_ok(Elbo):
    def model():
        with pyro.plate("p", 2):
            pyro.sample("z", dist.Normal(jnp.zeros(2), 1.0))

    def guide():
        with pyro.plate("p", 2):
            pyro.sample("z", dist.Normal(jnp.zeros(2), 1.0))

    with pyro.validation_enabled():
        assert_ok(model, guide, Elbo())


def test_plate_dim_collision_error():
    def model():
        with pyro.plate("p1", 2, dim=-1), pyro.plate("p2", 3, dim=-1):
            pyro.sample("z", dist.Normal(jnp.zeros((3, 2)), 1.0))

    def guide():
        pass

    assert_error(model, guide, Trace_ELBO())


def test_nested_plates_ok():
    def model():
        with pyro.plate("outer", 3, dim=-2):
            with pyro.plate("inner", 2, dim=-1):
                pyro.sample("z", dist.Normal(jnp.zeros((3, 2)), 1.0))

    def guide():
        with pyro.plate("outer", 3, dim=-2):
            with pyro.plate("inner", 2, dim=-1):
                pyro.sample("z", dist.Normal(jnp.zeros((3, 2)), 1.0))

    assert_ok(model, guide, Trace_ELBO())


def test_enum_discrete_misuse_max_plate_nesting():
    """Enumerated site inside a plate deeper than max_plate_nesting."""

    @config_enumerate
    def model():
        with pyro.plate("p", 3, dim=-2):
            pyro.sample("z", dist.Bernoulli(0.3))

    def guide():
        pass

    # declared max_plate_nesting=1 but plate uses dim=-2
    assert_error(model, guide, TraceEnum_ELBO(max_plate_nesting=1))


def test_enum_discrete_parallel_ok():
    @config_enumerate
    def model():
        z = pyro.sample("z", dist.Bernoulli(0.3))
        pyro.sample(
            "x", dist.Normal(z, 1.0), obs=jnp.array(0.2)
        )

    def guide():
        pass

    assert_ok(model, guide, TraceEnum_ELBO(max_plate_nesting=0))


def test_missing_param_error():
    """pyro.param lookup of an undefined name raises."""

    def model():
        pyro.sample("z", dist.Normal(0.0, 1.0))

    def guide():
        loc = pyro.param("undefined_lookup_name")
        pyro.sample("z", dist.Normal(loc, 1.0))

    assert_error(model, guide, Trace_ELBO())


@pytest.mark.parametrize("Elbo", ELBOS)
def test_obs_mismatched_event_shape_error(Elbo):
    def model():
        pyro.sample(
            "x",
            dist.Normal(jnp.zeros(3), 1.0).to_event(1),
            obs=jnp.zeros(4),
        )

    def guide():
        pass

    with pyro.validation_enabled():
        assert_error(model, guide, Elbo())


def test_subsample_scaling_ok():
    data = jnp.arange(10.0)

    def model():
        with pyro.plate("data", 10, subsample_size=5) as idx:
            pyro.sample(
                "x", dist.Normal(0.0, 1.0), obs=data[idx]
            )

    def guide():
        pass

    assert_ok(model, guide, Trace_ELBO())


def test_vectorized_num_particles_ok():
    def model():
        with pyro.plate("p", 2):
            pyro.sample("z", dist.Normal(jnp.zeros(2), 1.0))

    def guide():
        with pyro.plate("p", 2):
            pyro.sample("z", dist.Normal(jnp.zeros(2), 1.0))

    assert_ok(
        model,
        guide,
        Trace_ELBO(num_particles=7, vectorize_particles=True),
    )


@pytest.mark.parametrize("Elbo", ELBOS)
def test_plate_size_mismatch_model_guide_error(Elbo):
    """Same plate name, different sizes in model vs guide."""

    def model():
        with pyro.plate("data", 4):
            pyro.sample("z", dist.Normal(0.0, 1.0))

    def guide():
        with pyro.plate("data", 5):
            pyro.sample("z", dist.Normal(0.0, 1.0))

    assert_error(model, guide, Elbo())


def test_subsample_larger_than_size_error():
    def model():
        with pyro.plate("data", 4, subsample_size=10):
            pyro.sample("z", dist.Normal(0.0, 1.0))

    assert_error(model, lambda: None, Trace_ELBO())


def test_same_name_two_plates_same_trace_error():
    def model():
        with pyro.plate("p", 3):
            pyro.sample("a", dist.Normal(0.0, 1.0))
        with pyro.plate("p", 4):
            pyro.sample("b", dist.Normal(0.0, 1.0))

    assert_error(model, lambda: None, Trace_ELBO())


@pytest.mark.parametrize("Elbo", ELBOS)
def test_mask_wrong_shape_error(Elbo):
    def model():
        with pyro.plate("data", 4):
            with pyro.poutine.mask(mask=jnp.ones(3, bool)):
                pyro.sample(
                    "z", dist.Normal(jnp.zeros(4), 1.0)
                )

    assert_error(model, lambda: None, Elbo())


@pytest.mark.parametrize("Elbo", ELBOS)
def test_to_event_ok(Elbo):
    def model():
        pyro.sample(
            "z", dist.Normal(jnp.zeros((2, 3)), 1.0).to_event(2)
        )

    def guide():
        loc = pyro.param("loc", jnp.zeros((2, 3)))
        pyro.sample("z", dist.Normal(loc, 1.0).to_event(2))

    assert_ok(model, guide, Elbo())


@pytest.mark.parametrize("Elbo", ELBOS)
def test_factor_and_deterministic_ok(Elbo):
    def model():
        z = pyro.sample("z", dist.Normal(0.0, 1.0))
        pyro.deterministic("z2", z * z)
        pyro.factor("penalty", -0.5 * z * z)

    def guide():
        loc = pyro.param("loc", jnp.zeros(()))
        pyro.sample("z", dist.Normal(loc, 1.0))

    assert_ok(model, guide, Elbo())


def test_scale_handler_ok():
    def model():
        with pyro.poutine.scale(scale=0.5):
            pyro.sample("z", dist.Normal(0.0, 1.0))

    def guide():
        loc = pyro.param("loc", jnp.zeros(()))
        with pyro.poutine.scale(scale=0.5):
            pyro.sample("z", dist.Normal(loc, 1.0))

    assert_ok(model, guide, Trace_ELBO())


def test_enum_in_model_without_traceenum_warns_or_errors():
    """Model-side infer={'enumerate': ...} under plain Trace_ELBO must
    not silently sample (the reference warns)."""

    def model():
        pyro.sample(
            "z",
            dist.Bernoulli(0.5),
            infer={"enumerate": "parallel"},
        )

    def guide():
        q = pyro.param("q", jnp.asarray(0.5))
        pyro.sample("z", dist.Bernoulli(q))

    import warnings as _w

    pyro.clear_param_store()
    with _w.catch_warnings(record=True):
        _w.simplefilter("always")
        # either path is acceptable: a warning or an error; silent
        # wrong answers are not
        try:
            SVI(model, guide, Adam({"lr": 1e-6}), Trace_ELBO()).step()
        except (ValueError, RuntimeError, NotImplementedError):
            pass


@pytest.mark.parametrize("Elbo", ELBOS)
def test_obs_inside_smaller_plate_error(Elbo):
    """Observation whose batch exceeds its plate size."""

    def model():
        with pyro.plate("data", 3):
            pyro.sample(
                "obs",
                dist.Normal(0.0, 1.0),
                obs=jnp.zeros(5),
            )

    assert_error(model, lambda: None, Elbo())


def test_nested_plate_reuse_ok():
    """The same plate object reused across contexts (reentrant)."""

    def model():
        p = pyro.plate("data", 3, dim=-1)
        with p:
            pyro.sample("a", dist.Normal(0.0, 1.0))
        with p:
            pyro.sample("b", dist.Normal(0.0, 1.0))

    def guide():
        p = pyro.plate("data", 3, dim=-1)
        loc = pyro.param("loc", jnp.zeros(3))
        with p:
            pyro.sample("a", dist.Normal(loc, 1.0))
        with p:
            pyro.sample("b", dist.Normal(loc, 1.0))

    assert_ok(model, guide, Trace_ELBO())


def test_param_reregister_returns_existing_ok():
    """Re-registering a param with a different init returns the existing
    value (first registration wins — reference behavior, no error)."""

    def model():
        w = pyro.param("w", jnp.zeros(3))
        pyro.sample("z", dist.Normal(0.0, 1.0))

    def guide():
        # guide runs first in an SVI step, so "w" registers as (4,)
        w = pyro.param("w", jnp.zeros(4))
        pyro.sample("z", dist.Normal(0.0, 1.0))

    assert_ok(model, guide, Trace_ELBO())
    assert pyro.param("w").shape == (4,)
