"""State-space Gaussian-process time series models.

Ref ``examples/contrib/timeseries/gp_models.py``: fit an
IndependentMaternGP or LinearlyCoupledMaternGP to multivariate series by
maximum marginal likelihood (the exact Kalman log-density is one
associative-scan filter), then report one-step-ahead forecast accuracy.

Run:  python examples/timeseries_gp.py --model imgp --num-steps 300
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu as pyro
from pyro_tpu.contrib.timeseries import (
    IndependentMaternGP,
    LinearlyCoupledMaternGP,
)
from pyro_tpu.infer import SVI, Trace_ELBO
from pyro_tpu.optim import Adam


def synthetic_series(key, T, obs_dim=2):
    t = jnp.arange(T, dtype=jnp.float32)
    k = jax.random.split(key, obs_dim + 1)
    cols = [
        jnp.sin(0.2 * (i + 1) * t) + 0.1 * jax.random.normal(k[i], (T,))
        for i in range(obs_dim)
    ]
    return jnp.stack(cols, -1)


def main(args):
    pyro.set_rng_seed(args.seed)
    data = synthetic_series(jax.random.key(args.seed), args.train_window + 1)
    targets = data[: args.train_window]

    if args.model == "imgp":
        gp = IndependentMaternGP(nu=1.5, obs_dim=data.shape[-1])
    else:
        gp = LinearlyCoupledMaternGP(
            nu=1.5, obs_dim=data.shape[-1], num_gps=2
        )

    def model(t):
        pyro.factor("log_prob", gp.log_prob(t))

    svi = SVI(model, lambda t: None, Adam({"lr": args.learning_rate}),
              Trace_ELBO())
    losses = svi.run_steps(args.num_steps, targets)
    print(
        f"negative log-likelihood: first={float(losses[0]):.2f} "
        f"last={float(losses[-1]):.2f}"
    )

    pred = gp.forecast(targets, jnp.array([1.0]))
    truth = np.asarray(data[args.train_window])
    err = np.abs(np.asarray(pred.mean)[0] - truth)
    print(
        "one-step forecast error per dim:",
        np.array2string(err, precision=3),
    )
    return float(err.mean())


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--model", default="imgp", choices=["imgp", "lcmgp"])
    p.add_argument("--train-window", type=int, default=80)
    p.add_argument("--num-steps", type=int, default=300)
    p.add_argument("--learning-rate", type=float, default=0.01)
    p.add_argument("--seed", type=int, default=0)
    main(p.parse_args())
