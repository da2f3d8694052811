"""Effect-handler semantics tests (mirrors ``tests/poutine/test_poutine.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine


def simple_model():
    x = pyro.sample("x", dist.Normal(0.0, 1.0))
    y = pyro.sample("y", dist.Normal(x, 1.0))
    return y


def test_trace_records_sites():
    tr = poutine.trace(poutine.seed(simple_model, 0)).get_trace()
    assert set(tr.stochastic_nodes()) == {"x", "y"}
    assert tr.nodes["x"]["type"] == "sample"
    assert not tr.nodes["x"]["is_observed"]


def test_seed_reproducible():
    tr1 = poutine.trace(poutine.seed(simple_model, 42)).get_trace()
    tr2 = poutine.trace(poutine.seed(simple_model, 42)).get_trace()
    tr3 = poutine.trace(poutine.seed(simple_model, 7)).get_trace()
    assert np.allclose(tr1.nodes["x"]["value"], tr2.nodes["x"]["value"])
    assert not np.allclose(tr1.nodes["x"]["value"], tr3.nodes["x"]["value"])


def test_site_keys_differ():
    tr = poutine.trace(poutine.seed(simple_model, 0)).get_trace()
    assert not np.allclose(tr.nodes["x"]["value"], tr.nodes["y"]["value"])


def test_replay():
    tr = poutine.trace(poutine.seed(simple_model, 0)).get_trace()
    replayed = poutine.trace(
        poutine.seed(poutine.replay(simple_model, trace=tr), 99)
    ).get_trace()
    assert np.allclose(
        replayed.nodes["x"]["value"], tr.nodes["x"]["value"]
    )
    assert np.allclose(
        replayed.nodes["y"]["value"], tr.nodes["y"]["value"]
    )


def test_condition():
    conditioned = poutine.condition(simple_model, data={"x": jnp.array(3.0)})
    tr = poutine.trace(poutine.seed(conditioned, 0)).get_trace()
    assert np.allclose(tr.nodes["x"]["value"], 3.0)
    assert tr.nodes["x"]["is_observed"]


def test_do_severs_dependence():
    intervened = poutine.do(simple_model, data={"x": jnp.array(5.0)})
    tr = poutine.trace(poutine.seed(intervened, 0)).get_trace()
    # x not recorded as a latent (stop=True hides it below do handler)
    assert np.allclose(tr.nodes["y"]["fn"].loc, 5.0)


def test_block():
    blocked = poutine.block(simple_model, hide=["x"])
    tr = poutine.trace(poutine.seed(blocked, 0)).get_trace()
    assert "x" not in tr
    assert "y" in tr


def test_block_expose():
    blocked = poutine.block(simple_model, expose=["x"])
    tr = poutine.trace(poutine.seed(blocked, 0)).get_trace()
    assert "x" in tr
    assert "y" not in tr


def test_scale_handler():
    def model():
        pyro.sample("x", dist.Normal(0.0, 1.0), obs=jnp.array(0.5))

    tr = poutine.trace(poutine.scale(model, scale=3.0)).get_trace()
    tr.compute_log_prob()
    expected = 3.0 * dist.Normal(0.0, 1.0).log_prob(jnp.array(0.5))
    assert np.allclose(tr.nodes["x"]["log_prob"], expected)


def test_mask_handler():
    def model():
        with pyro.plate("p", 3):
            pyro.sample(
                "x", dist.Normal(0.0, 1.0), obs=jnp.array([1.0, 2.0, 3.0])
            )

    m = jnp.array([True, False, True])
    tr = poutine.trace(poutine.mask(model, mask=m)).get_trace()
    tr.compute_log_prob()
    lp = tr.nodes["x"]["log_prob"]
    assert lp[1] == 0.0
    assert lp[0] != 0.0


def test_uncondition():
    def model():
        pyro.sample("x", dist.Normal(0.0, 1.0), obs=jnp.array(2.0))

    tr = poutine.trace(
        poutine.seed(poutine.uncondition(model), 0)
    ).get_trace()
    assert not tr.nodes["x"]["is_observed"]
    assert not np.allclose(tr.nodes["x"]["value"], 2.0)


def test_lift():
    def model():
        a = pyro.param("a", jnp.array(1.0))
        return pyro.sample("obs", dist.Normal(a, 1.0), obs=jnp.array(0.0))

    lifted = poutine.lift(model, prior=dist.Normal(0.0, 1.0))
    tr = poutine.trace(poutine.seed(lifted, 0)).get_trace()
    assert tr.nodes["a"]["type"] == "sample"
    assert not tr.nodes["a"]["is_observed"]


def test_plate_broadcast():
    def model():
        with pyro.plate("outer", 3, dim=-2):
            with pyro.plate("inner", 2, dim=-1):
                x = pyro.sample("x", dist.Normal(0.0, 1.0))
                return x

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    assert tr.nodes["x"]["value"].shape == (3, 2)
    assert tr.nodes["x"]["fn"].batch_shape == (3, 2)


def test_plate_auto_dim_allocation():
    def model():
        with pyro.plate("a", 3):
            pyro.sample("x", dist.Normal(0.0, 1.0))
            with pyro.plate("b", 2):
                pyro.sample("y", dist.Normal(0.0, 1.0))

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    assert tr.nodes["x"]["value"].shape == (3,)
    assert tr.nodes["y"]["value"].shape == (2, 3)


def test_plate_collision_raises():
    def model():
        with pyro.plate("a", 3, dim=-1):
            with pyro.plate("b", 2, dim=-1):
                pyro.sample("x", dist.Normal(0.0, 1.0))

    with pytest.raises(ValueError):
        poutine.trace(poutine.seed(model, 0)).get_trace()


def test_sequential_plate():
    def model():
        for i in pyro.plate("loop", 4):
            pyro.sample(f"x_{i}", dist.Normal(0.0, 1.0))

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    assert set(tr.stochastic_nodes()) >= {"x_0", "x_1", "x_2", "x_3"}


def test_deterministic_and_factor():
    def model():
        x = pyro.sample("x", dist.Normal(0.0, 1.0))
        pyro.deterministic("x2", x * 2)
        pyro.factor("penalty", -jnp.abs(x))
        return x

    tr = poutine.trace(poutine.seed(model, 0)).get_trace()
    assert np.allclose(
        tr.nodes["x2"]["value"], 2 * tr.nodes["x"]["value"]
    )
    tr.compute_log_prob()
    assert np.allclose(
        tr.nodes["penalty"]["log_prob"],
        -jnp.abs(tr.nodes["x"]["value"]),
    )


def test_trace_inside_jit():
    """The whole handler stack must be traceable by jax.jit."""

    def model(data):
        loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
        pyro.sample("obs", dist.Normal(loc, 1.0), obs=data)

    @jax.jit
    def logjoint(data, key):
        tr = poutine.trace(
            poutine.seed(model, rng_key=key)
        ).get_trace(data)
        return tr.log_prob_sum()

    out = logjoint(jnp.array(1.0), jax.random.key(0))
    assert jnp.isfinite(out)


def test_vmap_over_keys():
    def model():
        return pyro.sample("x", dist.Normal(0.0, 1.0))

    def draw(key):
        tr = poutine.trace(poutine.seed(model, rng_key=key)).get_trace()
        return tr.nodes["x"]["value"]

    xs = jax.vmap(draw)(jax.random.split(jax.random.key(0), 100))
    assert xs.shape == (100,)
    assert np.std(np.asarray(xs)) > 0.5


def test_obs_mask():
    def model(data, mask):
        with pyro.plate("p", 3):
            x = pyro.sample(
                "x", dist.Normal(0.0, 1.0), obs=data, obs_mask=mask
            )
        return x

    data = jnp.array([1.0, 2.0, 3.0])
    mask = jnp.array([True, False, True])
    tr = poutine.trace(poutine.seed(model, 0)).get_trace(data, mask)
    assert "x_observed" in tr
    assert "x_unobserved" in tr
    val = tr.nodes["x"]["value"]
    assert np.allclose(val[0], 1.0)
    assert np.allclose(val[2], 3.0)


def test_sequential_plate_subsampling_scales():
    """Sequential plate with subsample_size yields that many indices and
    scales in-loop log-probs by size/subsample_size
    (ref ``subsample_messenger.py:74`` + ``indep_messenger.py:110``)."""
    data = jnp.arange(10.0)

    def model():
        for i in pyro.plate("data", 10, subsample_size=4):
            pyro.sample(f"x_{i}", dist.Normal(0.0, 1.0), obs=data[i])

    tr = poutine.trace(
        poutine.seed(model, rng_key=jax.random.key(0))
    ).get_trace()
    tr.compute_log_prob()
    sites = [n for n in tr.nodes if n.startswith("x_")]
    assert len(sites) == 4
    site = tr.nodes[sites[0]]
    ratio = float(site["log_prob"] / site["unscaled_log_prob"])
    assert abs(ratio - 2.5) < 1e-6
