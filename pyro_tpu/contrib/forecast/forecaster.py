"""Forecasting models and the Forecaster engine.

Ref ``pyro/contrib/forecast/forecaster.py:37`` (ForecastingModel),
``:197`` (Forecaster) and ``util.py:113,154`` (PrefixReplay /
PrefixCondition): training conditions the noise distribution on observed
residuals; forecasting prefix-conditions the noise distribution on the
observed window and samples the future.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from ... import poutine
from ...distributions.distribution import Independent
from ...distributions.hmm import GaussianHMM
from ...infer import SVI, Trace_ELBO
from ...infer.autoguide import AutoNormal
from ...optim import DCTAdam


# --------------------------------------------------------------------------
# prefix_condition: singledispatch registry over noise-distribution types
# (ref ``forecast/util.py:205-292``).  Given a distribution over (t+f, D)
# and data over the first t steps, produce the conditional over the
# remaining f steps.  HMMs condition exactly via filtering; iid families
# slice their time-indexed parameters (the future is independent of the
# prefix); wrappers recurse into their base distribution.

from functools import singledispatch


@singledispatch
def _prefix_condition(d, data):
    # fall through to a distribution-level method (GaussianHMM, and any
    # user distribution implementing the protocol; ref util.py:217-222)
    try:
        return d.prefix_condition(data)
    except AttributeError as e:
        raise NotImplementedError(
            f"prefix_condition() does not support {type(d).__name__}"
        ) from e


def _slice_future(param, t, batch_shape):
    """Slice a time-indexed parameter to the future window, broadcasting
    scalars/partial shapes to the full (..., T, D) batch first."""
    if isinstance(param, int) and not hasattr(param, "ndim"):
        return param  # python-int parameter (e.g. total_count)
    param = jnp.broadcast_to(jnp.asarray(param), batch_shape)
    return param[..., t:, :]


# iid univariate families: parameters indexed by time just slice
# (ref util.py:179-267 UNIVARIATE_DISTS; attribute names match ours)
_UNIVARIATE_DISTS = {
    dist.Bernoulli: ("probs",),
    dist.Beta: ("concentration1", "concentration0"),
    dist.Cauchy: ("loc", "scale"),
    dist.Exponential: ("rate",),
    dist.Gamma: ("concentration", "rate"),
    dist.GammaPoisson: ("concentration", "rate"),
    dist.Geometric: ("probs",),
    dist.InverseGamma: ("concentration", "rate"),
    dist.Laplace: ("loc", "scale"),
    dist.LogNormal: ("loc", "scale"),
    dist.NegativeBinomial: ("total_count", "probs"),
    dist.Normal: ("loc", "scale"),
    dist.Poisson: ("rate",),
    dist.Stable: ("stability", "skew", "scale", "loc"),
    dist.StableWithLogProb: ("stability", "skew", "scale", "loc"),
    dist.StudentT: ("df", "loc", "scale"),
    dist.Uniform: ("low", "high"),
    dist.ZeroInflatedPoisson: ("rate", "gate"),
}


def _prefix_condition_univariate(d, data):
    t = data.shape[-2]
    params = {
        name: _slice_future(getattr(d, name), t, d.batch_shape)
        for name in _UNIVARIATE_DISTS[type(d)]
    }
    return type(d)(**params)


for _type in _UNIVARIATE_DISTS:
    _prefix_condition.register(_type)(_prefix_condition_univariate)


@_prefix_condition.register(dist.MultivariateNormal)
def _(d, data):
    # batch (..., T), event (D,): slice the time batch axis
    t = data.shape[-2]
    n = d.event_shape[0]
    loc = jnp.broadcast_to(d.loc, d.batch_shape + (n,))[..., t:, :]
    scale_tril = jnp.broadcast_to(
        d.scale_tril, d.batch_shape + (n, n)
    )[..., t:, :, :]
    return dist.MultivariateNormal(loc, scale_tril=scale_tril)


@_prefix_condition.register(dist.MaskedDistribution)
def _(d, data):
    base_dist = _prefix_condition(d.base_dist, data)
    mask = d._mask
    if hasattr(mask, "ndim") and mask.ndim:
        mask = jnp.broadcast_to(mask, d.batch_shape)
        mask = mask[
            tuple(slice(-size, None) for size in base_dist.batch_shape)
        ]
    return base_dist.mask(mask)


@_prefix_condition.register(Independent)
def _(d, data):
    base_dist = _prefix_condition(d.base_dist, data)
    return base_dist.to_event(d.reinterpreted_batch_ndims)


@_prefix_condition.register(dist.FoldedDistribution)
def _(d, data):
    base_dist = _prefix_condition(d.base_dist, data)
    return dist.FoldedDistribution(base_dist)


@_prefix_condition.register(dist.TransformedDistribution)
def _(d, data):
    for t in reversed(d.transforms):
        data = t.inv(data)
    base_dist = _prefix_condition(d.base_dist, data)
    return dist.TransformedDistribution(base_dist, d.transforms)


@_prefix_condition.register(dist.IndependentHMM)
def _(d, data):
    # (..., t, D) -> one scalar HMM per output dim (ref util.py:239-243)
    base_data = jnp.swapaxes(data, -1, -2)[..., None]
    base_dist = _prefix_condition(d.base_dist, base_data)
    return dist.IndependentHMM(base_dist)


def prefix_condition(d, data, prefix_len: int, duration_total: int):
    """Conditional distribution of the future given the observed prefix
    (ref ``forecast/util.py:205``): dispatches over the noise
    distribution's type; exact filtering for HMMs, parameter slicing for
    iid families, recursion for wrappers."""
    del duration_total  # implied by d.event_shape / data
    return _prefix_condition(d, data[..., :prefix_len, :])


class ForecastingModel:
    """Subclass and implement ``model(zero_data, covariates)`` calling
    ``self.predict(noise_dist, prediction)`` exactly once
    (ref ``forecaster.py:37``)."""

    def model(self, zero_data, covariates):
        raise NotImplementedError

    # -- internals ----------------------------------------------------------
    def predict(self, noise_dist, prediction) -> None:
        """Ref ``forecaster.py:111``: during training, observe
        residual = data - prediction under noise_dist; during forecasting,
        sample the future residual given the observed prefix."""
        assert self._data is not None
        t_obs = self._data.shape[-2]
        t_total = self._zero_data.shape[-2]
        if t_obs == t_total:  # training
            residual = self._data - prediction
            pyro.sample("residual", noise_dist, obs=residual)
            self._forecast_value = None
        else:  # forecasting
            left = prediction[..., :t_obs, :]
            residual_obs = self._data - left
            cond = prefix_condition(
                noise_dist, residual_obs, t_obs, t_total
            )
            noise = pyro.sample("residual", cond)
            self._forecast_value = (
                prediction[..., t_obs:, :] + noise
            )

    def __call__(self, data, covariates):
        self._data = data
        t_total = covariates.shape[0] if covariates is not None and covariates.ndim else data.shape[-2]
        t_total = max(t_total, data.shape[-2])
        zero_shape = data.shape[:-2] + (t_total,) + data.shape[-1:]
        self._zero_data = jnp.zeros(zero_shape)
        self._forecast_value = None
        self.model(self._zero_data, covariates)
        return self._forecast_value


class Forecaster:
    """Trains a ForecastingModel with SVI and draws forecasts
    (ref ``forecaster.py:197``)."""

    def __init__(
        self,
        model: ForecastingModel,
        data,
        covariates,
        *,
        guide=None,
        learning_rate: float = 0.01,
        num_steps: int = 1001,
        optim=None,
        rng_key=None,
        **kwargs,
    ):
        self.model = model
        if guide is None:
            guide = AutoNormal(
                lambda d, c: model(d, c), init_scale=0.1
            )
        self.guide = guide
        optim = optim or DCTAdam({"lr": learning_rate})
        svi = SVI(
            lambda d, c: model(d, c), guide, optim, Trace_ELBO()
        )
        # one lax.scan-compiled program instead of the reference's Python
        # step loop (ref ``forecaster.py:259-266``) — a per-step loop pays
        # a host<->device round trip per step on TPU
        self.losses = [
            float(x) for x in svi.run_steps(num_steps, data, covariates)
        ]

    def __call__(self, data, covariates, num_samples: int, rng_key=None):
        """Sample forecasts over the future window
        (ref ``forecaster.py:320``): returns
        (num_samples,) + batch + (t_future, obs_dim)."""
        if rng_key is None:
            rng_key = jax.random.key(13)
        keys = jax.random.split(rng_key, num_samples)
        outs = []
        for key in keys:
            k1, k2 = jax.random.split(key)
            with poutine.seed(rng_key=k1):
                guide_trace = poutine.trace(
                    lambda: self.guide(data, covariates)
                ).get_trace()
            with poutine.seed(rng_key=k2):
                out = poutine.replay(
                    lambda: self.model(data, covariates),
                    trace=guide_trace,
                )()
            outs.append(out)
        return jnp.stack(outs)


class HMCForecaster:
    """Forecaster using NUTS posterior samples instead of SVI
    (ref ``forecaster.py:395``).  Chains are vmapped on-device; optional
    Haar/DCT time reparameterization whitens long time series for HMC."""

    def __init__(
        self,
        model: ForecastingModel,
        data,
        covariates=None,
        *,
        num_warmup: int = 1000,
        num_samples: int = 1000,
        num_chains: int = 1,
        time_reparam=None,
        dense_mass: bool = False,
        max_tree_depth: int = 10,
        rng_key=None,
    ):
        from ...infer.mcmc import MCMC, NUTS
        from ...infer.reparam import HaarReparam, DiscreteCosineReparam

        if time_reparam == "haar":
            config = lambda site: (
                HaarReparam() if not site["is_observed"] else None
            )
            model_fn = poutine.reparam(
                lambda: model(self._zeros(data, covariates), covariates),
                config=config,
            )
        elif time_reparam == "dct":
            config = lambda site: (
                DiscreteCosineReparam()
                if not site["is_observed"]
                else None
            )
            model_fn = poutine.reparam(
                lambda: model(self._zeros(data, covariates), covariates),
                config=config,
            )
        elif time_reparam is None:
            model_fn = lambda: model(data, covariates)
        else:
            raise ValueError(f"unknown time_reparam: {time_reparam!r}")

        self.model = model
        kernel = NUTS(
            model_fn,
            full_mass=dense_mass,
            max_tree_depth=max_tree_depth,
        )
        mcmc = MCMC(
            kernel,
            warmup_steps=num_warmup,
            num_samples=num_samples,
            num_chains=num_chains,
        )
        mcmc.run(
            rng_key=rng_key if rng_key is not None else jax.random.key(0)
        )
        self._mcmc = mcmc
        self._samples = mcmc.get_samples()
        self._num_samples = num_samples * num_chains

    @staticmethod
    def _zeros(data, covariates):
        return data

    def __call__(self, data, covariates, num_samples: int, rng_key=None):
        """Forecast by replaying random posterior draws through the model
        over the extended covariate window (ref ``forecaster.py:487``)."""
        if rng_key is None:
            rng_key = jax.random.key(17)
        k_idx, k_fore = jax.random.split(rng_key)
        idx = jax.random.randint(
            k_idx, (num_samples,), 0, self._num_samples
        )
        keys = jax.random.split(k_fore, num_samples)
        outs = []
        for i, key in zip(idx.tolist(), keys):
            sample_i = {
                name: value[i] for name, value in self._samples.items()
            }
            with poutine.seed(rng_key=key):
                out = poutine.condition(
                    lambda: self.model(data, covariates), data=sample_i
                )()
            outs.append(out)
        return jnp.stack(outs)
