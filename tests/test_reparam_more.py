"""Per-reparameterizer correctness suites.

Ports of ``/root/reference/tests/infer/reparam/``:

* ``test_split.py`` — SplitReparam preserves values, total log-density,
  and parameter gradients when the split pieces are conditioned to the
  unsplit sample;
* ``test_studentt.py`` — StudentTReparam (Gamma-mixture-of-Normals)
  matches StudentT moments and the exact density via KS;
* ``test_stable.py`` — Latent/SymmetricStableReparam reproduce the Stable
  sampling distribution (KS two-sample test);
* ``test_softmax.py`` — GumbelSoftmaxReparam reproduces one-hot
  Categorical frequencies;
* ``test_projected_normal.py`` — ProjectedNormalReparam reproduces
  direction moments.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.stats import ks_2samp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer.reparam import (
    GumbelSoftmaxReparam,
    LatentStableReparam,
    ProjectedNormalReparam,
    SplitReparam,
    StudentTReparam,
    SymmetricStableReparam,
)
from pyro_tpu.infer.svi import ParamsMessenger


@pytest.mark.parametrize(
    "event_shape,splits,dim",
    [
        ((6,), [2, 1, 3], -1),
        ((2, 5), [2, 3], -1),
        ((4, 2), [1, 3], -2),
        ((2, 3, 1), [1, 2], -2),
    ],
    ids=str,
)
@pytest.mark.parametrize("batch_shape", [(), (4,), (3, 2)], ids=str)
def test_split_normal(batch_shape, event_shape, splits, dim):
    """Ref reparam/test_split.py::test_normal."""
    shape = batch_shape + event_shape
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    loc0 = jax.random.uniform(k1, shape, minval=-1.0, maxval=1.0)
    scale0 = jax.random.uniform(k2, shape, minval=0.5, maxval=1.5)

    def model(loc, scale):
        with pyro.plate_stack("plates", batch_shape):
            pyro.sample(
                "x", dist.Normal(loc, scale).to_event(len(event_shape))
            )

    trace = poutine.trace(
        poutine.seed(model, rng_key=jax.random.PRNGKey(0))
    ).get_trace(loc0, scale0)
    expected_value = trace.nodes["x"]["value"]

    def expected_lp(loc, scale):
        tr = poutine.trace(
            poutine.condition(model, data={"x": expected_value})
        ).get_trace(loc, scale)
        return tr.log_prob_sum()

    # split the sample along dim
    sizes = np.cumsum([0] + list(splits))
    axis = dim - 0  # dim counts within event shape from the right
    split_values = {}
    for i in range(len(splits)):
        idx = [slice(None)] * len(shape)
        idx[dim if dim < 0 else dim] = slice(int(sizes[i]), int(sizes[i + 1]))
        split_values[f"x_split_{i}"] = expected_value[tuple(idx)]

    rep = SplitReparam(splits, dim)

    def reparam_model(loc, scale):
        with poutine.reparam(config={"x": rep}):
            model(loc, scale)

    def actual_lp(loc, scale):
        tr = poutine.trace(
            poutine.condition(reparam_model, data=split_values)
        ).get_trace(loc, scale)
        return tr.log_prob_sum()

    tr = poutine.trace(
        poutine.condition(reparam_model, data=split_values)
    ).get_trace(loc0, scale0)
    assert all(name in tr.nodes for name in split_values)
    assert isinstance(tr.nodes["x"]["fn"], dist.Delta)
    assert tr.nodes["x"]["fn"].batch_shape == batch_shape
    assert tr.nodes["x"]["fn"].event_shape == event_shape
    assert np.allclose(
        np.asarray(tr.nodes["x"]["value"]), np.asarray(expected_value), atol=1e-6
    )

    e_lp, e_grads = jax.value_and_grad(expected_lp, argnums=(0, 1))(loc0, scale0)
    a_lp, a_grads = jax.value_and_grad(actual_lp, argnums=(0, 1))(loc0, scale0)
    assert np.allclose(float(e_lp), float(a_lp), atol=1e-4)
    for eg, ag in zip(e_grads, a_grads):
        assert np.allclose(np.asarray(eg), np.asarray(ag), atol=1e-4)


def _abs_moments(x):
    """ref reparam/test_studentt.py::get_moments: mean and mean |x - p|
    around 5 probe points."""
    points = np.asarray([-4.0, -1.0, 0.0, 1.0, 4.0])
    points = points.reshape((-1,) + (1,) * x.ndim)
    return np.concatenate([x.mean(0)[None], np.abs(x[None] - points).mean(1)])


@pytest.mark.parametrize("shape", [(), (4,), (2, 3)], ids=str)
def test_studentt_moments(shape):
    """Ref reparam/test_studentt.py::test_moments."""
    ks = jax.random.split(jax.random.PRNGKey(5), 3)
    df = jax.random.uniform(ks[0], shape, minval=1.8, maxval=5.0)
    loc = jax.random.uniform(ks[1], shape, minval=-1.0, maxval=1.0)
    scale = jax.random.uniform(ks[2], shape, minval=0.5, maxval=1.0)

    def model():
        with pyro.plate_stack("plates", shape):
            with pyro.plate("particles", 100_000):
                return pyro.sample("x", dist.StudentT(df, loc, scale))

    tr = poutine.trace(
        poutine.seed(model, rng_key=jax.random.PRNGKey(1))
    ).get_trace()
    expected = _abs_moments(np.asarray(tr.nodes["x"]["value"]))

    def reparam_model():
        with poutine.reparam(config={"x": StudentTReparam()}):
            return model()

    tr = poutine.trace(
        poutine.seed(reparam_model, rng_key=jax.random.PRNGKey(2))
    ).get_trace()
    assert isinstance(tr.nodes["x"]["fn"], dist.Normal)
    tr.compute_log_prob()  # smoke
    actual = _abs_moments(np.asarray(tr.nodes["x"]["value"]))
    assert np.abs(actual - expected).max() < 0.05


@pytest.mark.parametrize("df", [1.0, 1.5, 2.0, 3.0])
def test_studentt_distribution(df):
    """Reparameterized StudentT sampling matches direct sampling (KS)."""
    num = 50_000

    def model():
        with pyro.plate("particles", num):
            pyro.sample("x", dist.StudentT(df, 1.234, 0.5))

    tr0 = poutine.trace(
        poutine.seed(model, rng_key=jax.random.PRNGKey(3))
    ).get_trace()

    def reparam_model():
        with poutine.reparam(config={"x": StudentTReparam()}):
            model()

    tr1 = poutine.trace(
        poutine.seed(reparam_model, rng_key=jax.random.PRNGKey(4))
    ).get_trace()
    stat, pvalue = ks_2samp(
        np.asarray(tr0.nodes["x"]["value"]), np.asarray(tr1.nodes["x"]["value"])
    )
    assert pvalue > 0.02, (stat, pvalue)


@pytest.mark.parametrize(
    "stability,skew,Reparam",
    [
        (1.9, 0.0, SymmetricStableReparam),
        (1.5, 0.0, SymmetricStableReparam),
        (1.7, 0.5, LatentStableReparam),
        (1.2, -0.8, LatentStableReparam),
    ],
)
def test_stable_distribution(stability, skew, Reparam):
    """Ref reparam/test_stable.py::test_distribution (KS two-sample)."""
    num = 40_000

    def model():
        with pyro.plate("particles", num):
            pyro.sample("x", dist.Stable(stability, skew, 1.0, 0.5))

    tr0 = poutine.trace(
        poutine.seed(model, rng_key=jax.random.PRNGKey(8))
    ).get_trace()

    def reparam_model():
        with poutine.reparam(config={"x": Reparam()}):
            model()

    tr1 = poutine.trace(
        poutine.seed(reparam_model, rng_key=jax.random.PRNGKey(9))
    ).get_trace()
    x0 = np.asarray(tr0.nodes["x"]["value"])
    x1 = np.asarray(tr1.nodes["x"]["value"])
    assert np.isfinite(x1).all()
    stat, pvalue = ks_2samp(x0, x1)
    assert pvalue > 0.02, (stat, pvalue)


@pytest.mark.parametrize("temperature", [0.1, 0.5])
def test_gumbel_softmax_distribution(temperature):
    """Ref reparam/test_softmax.py::test_distribution: the reparameterized
    RelaxedOneHotCategorical matches direct sampling (argmax frequencies
    follow the probs; soft values agree in distribution per class)."""
    probs = jnp.asarray([0.1, 0.2, 0.3, 0.4])
    num = 40_000

    def model():
        with pyro.plate("particles", num):
            pyro.sample(
                "x",
                dist.RelaxedOneHotCategorical(temperature, probs=probs),
            )

    tr0 = poutine.trace(
        poutine.seed(model, rng_key=jax.random.PRNGKey(10))
    ).get_trace()

    def reparam_model():
        with poutine.reparam(config={"x": GumbelSoftmaxReparam()}):
            model()

    tr = poutine.trace(
        poutine.seed(reparam_model, rng_key=jax.random.PRNGKey(11))
    ).get_trace()
    assert "x_uniform" in tr.nodes
    x = np.asarray(tr.nodes["x"]["value"])
    # hard argmax frequencies follow the Gumbel-max law exactly
    freqs = np.bincount(x.argmax(-1), minlength=4) / num
    assert np.abs(freqs - np.asarray(probs)).max() < 0.01, freqs
    # per-class soft marginals match direct sampling (KS)
    x0 = np.asarray(tr0.nodes["x"]["value"])
    for k in range(4):
        stat, pvalue = ks_2samp(x0[:, k], x[:, k])
        assert pvalue > 0.01, (k, stat, pvalue)
    tr.compute_log_prob()  # smoke: masked Delta densities are zero/finite
    assert np.isfinite(np.asarray(tr.nodes["x"]["log_prob"])).all()


@pytest.mark.parametrize("dim", [2, 3, 4])
def test_projected_normal_distribution(dim):
    """Ref reparam/test_projected_normal.py: direction moments match."""
    concentration = jnp.zeros(dim).at[0].set(2.0)
    num = 50_000

    def model():
        with pyro.plate("particles", num):
            pyro.sample(
                "x", dist.ProjectedNormal(concentration)
            )

    tr0 = poutine.trace(
        poutine.seed(model, rng_key=jax.random.PRNGKey(12))
    ).get_trace()

    def reparam_model():
        with poutine.reparam(config={"x": ProjectedNormalReparam()}):
            model()

    tr1 = poutine.trace(
        poutine.seed(reparam_model, rng_key=jax.random.PRNGKey(13))
    ).get_trace()
    m0 = np.asarray(tr0.nodes["x"]["value"]).mean(0)
    m1 = np.asarray(tr1.nodes["x"]["value"]).mean(0)
    assert np.abs(m0 - m1).max() < 0.02, (m0, m1)
    # unit norm
    assert np.allclose(
        np.linalg.norm(np.asarray(tr1.nodes["x"]["value"]), axis=-1), 1.0, atol=1e-5
    )
