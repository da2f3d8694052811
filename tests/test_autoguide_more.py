"""Additional autoguide behaviors (ports pieces of the reference's
``tests/infer/test_autoguide.py``): quantiles across guide families,
param-store serialization round-trips through a trained guide, and
subsampled-plate training for the per-site guides.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.distributions import constraints
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.infer.autoguide import (
    AutoDelta,
    AutoDiagonalNormal,
    AutoLowRankMultivariateNormal,
    AutoMultivariateNormal,
    AutoNormal,
)
from pyro_tpu.optim import Adam


def _scalar_model():
    loc = pyro.sample("loc", dist.Normal(0.0, 1.0))
    scale = pyro.sample("scale", dist.LogNormal(0.0, 1.0))
    with pyro.plate("data", 3):
        pyro.sample(
            "obs", dist.Normal(loc, scale), obs=jnp.asarray([0.1, 0.2, 0.3])
        )


@pytest.mark.parametrize(
    "Guide",
    [
        AutoNormal,
        AutoDiagonalNormal,
        AutoMultivariateNormal,
        AutoLowRankMultivariateNormal,
    ],
    ids=lambda g: g.__name__,
)
def test_quantiles(Guide):
    """(ref test_autoguide.py:528) quantile ordering + support."""
    pyro.clear_param_store()
    guide = Guide(_scalar_model)
    svi = SVI(_scalar_model, guide, Adam({"lr": 0.05}), Trace_ELBO())
    for _ in range(200):
        svi.step()
    q = guide.quantiles([0.1, 0.5, 0.9])
    for name in ("loc", "scale"):
        lo, mid, hi = (float(q[name][i]) for i in range(3))
        assert lo < mid < hi, (name, lo, mid, hi)
    assert float(q["scale"][0]) > 0  # respects the positive support


@pytest.mark.parametrize(
    "Guide", [AutoNormal, AutoDelta, AutoDiagonalNormal],
    ids=lambda g: g.__name__,
)
def test_serialization_roundtrip(Guide, tmp_path):
    """A trained guide's params survive a param-store save/load and give
    identical medians (ref test_autoguide.py:461)."""
    pyro.clear_param_store()
    guide = Guide(_scalar_model)
    svi = SVI(_scalar_model, guide, Adam({"lr": 0.05}), Trace_ELBO())
    for _ in range(100):
        svi.step()
    median_before = {
        k: np.asarray(v) for k, v in guide.median().items()
    }
    path = str(tmp_path / "params.pkl")
    pyro.get_param_store().save(path)
    pyro.clear_param_store()
    pyro.get_param_store().load(path)
    median_after = {k: np.asarray(v) for k, v in guide.median().items()}
    assert set(median_before) == set(median_after)
    for k in median_before:
        np.testing.assert_allclose(
            median_after[k], median_before[k], rtol=1e-6, err_msg=k
        )


@pytest.mark.parametrize(
    "Guide", [AutoNormal, AutoDelta], ids=lambda g: g.__name__
)
def test_subsample_model(Guide):
    """Training with a subsampled plate + pyro.subsample data slicing
    (ref test_autoguide.py:1071)."""

    def model(x, y=None, batch_size=None):
        loc = pyro.param("loc", jnp.asarray(0.0))
        scale = pyro.param(
            "scale", jnp.asarray(1.0), constraint=constraints.positive
        )
        with pyro.plate("batch", len(x), subsample_size=batch_size):
            batch_x = pyro.subsample(x, event_dim=0)
            batch_y = (
                pyro.subsample(y, event_dim=0) if y is not None else None
            )
            mean = loc + scale * batch_x
            sigma = pyro.sample("sigma", dist.LogNormal(0.0, 1.0))
            return pyro.sample("obs", dist.Normal(mean, sigma), obs=batch_y)

    pyro.clear_param_store()
    full_size, batch_size = 50, 20
    x = jax.random.normal(jax.random.key(0), (full_size,))
    y = x + 0.1 * jax.random.normal(jax.random.key(1), (full_size,))

    guide = Guide(model)
    svi = SVI(model, guide, Adam({"lr": 0.02}), Trace_ELBO())
    losses = [
        svi.step(x, y, batch_size=batch_size) for _ in range(5)
    ]
    assert np.isfinite(losses).all()
    # per-site params cover the FULL plate, not just the batch
    store = pyro.get_param_store()
    names = [
        k
        for k in store.keys()
        if "sigma" in k and not k.endswith("scale")
    ]
    assert names, list(store.keys())
    assert np.asarray(store[names[0]]).shape == (full_size,)
