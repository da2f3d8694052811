"""Forecasting BART ridership with a hierarchical model.

Ref ``examples/contrib/forecast/bart.py``: a ForecastingModel over hourly
origin-destination ridership counts with a weekly seasonality component
and GaussianHMM noise, trained with the Forecaster (DCT-reparam SVI) and
evaluated with CRPS backtesting.

Uses the synthetic BART-like dataset from
``pyro_tpu.contrib.examples.bart.load_fake_od`` (no dataset egress).

Run:  python examples/forecast_bart.py --num-steps 300
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
import pyro_tpu.distributions as dist
from pyro_tpu.contrib.examples.bart import load_fake_od
from pyro_tpu.contrib.forecast import Forecaster, ForecastingModel, backtest
from pyro_tpu.ops.tensor_utils import periodic_repeat


class Model(ForecastingModel):
    """Weekly-seasonal trend + GaussianHMM noise (ref bart.py:26-86)."""

    def model(self, zero_data, covariates):
        duration, dim = zero_data.shape[-2:]

        # weekly seasonality: one coefficient per hour-of-week
        weekly = pyro.sample(
            "weekly",
            dist.Normal(0.0, 5.0).expand((168, dim)).to_event(2),
        )
        prediction = periodic_repeat(weekly, duration, dim=-2)

        # local level via a GaussianHMM over residuals
        init_dist = dist.Normal(jnp.zeros(1), 10.0).to_event(1)
        trans_scale = pyro.sample(
            "trans_scale", dist.LogNormal(-2.0, 1.0)
        )
        obs_scale = pyro.sample("obs_scale", dist.LogNormal(-2.0, 1.0))
        noise_dist = dist.GaussianHMM(
            init_dist,
            jnp.ones((1, 1, 1)),
            dist.Normal(jnp.zeros((1, 1)), trans_scale).to_event(1),
            jnp.ones((1, 1, dim)),
            dist.Normal(jnp.zeros((1, dim)), obs_scale).to_event(1),
            duration=duration,
        )
        self.predict(noise_dist, prediction)


def main(args):
    pyro.set_rng_seed(args.seed)
    dataset = load_fake_od()
    counts = dataset["counts"].reshape(dataset["counts"].shape[0], -1)
    data = jnp.log1p(counts[:, :1])
    T = data.shape[0]
    covariates = jnp.zeros((T, 0))
    t_train = int(0.8 * T)

    forecaster = Forecaster(
        Model(),
        data[:t_train],
        covariates[:t_train],
        num_steps=args.num_steps,
        learning_rate=args.learning_rate,
    )
    print(
        f"loss: first={float(forecaster.losses[0]):.2f} "
        f"last={float(forecaster.losses[-1]):.2f}"
    )
    samples = forecaster(
        data[:t_train],
        covariates,
        num_samples=args.num_samples,
        rng_key=jax.random.key(args.seed + 1),
    )
    truth = np.asarray(data[t_train:, 0])
    pred = np.asarray(samples.mean(0)[:, 0])
    mae = float(np.abs(pred - truth).mean())
    print(f"forecast MAE over {T - t_train} held-out steps: {mae:.3f}")
    return mae


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--num-steps", type=int, default=500)
    p.add_argument("--num-samples", type=int, default=100)
    p.add_argument("--learning-rate", type=float, default=0.05)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
