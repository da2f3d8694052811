"""Backtesting and forecast metrics (ref
``pyro/contrib/forecast/evaluate.py``)."""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...ops.stats import crps_empirical


def eval_mae(pred, truth) -> float:
    """Ref ``evaluate.py:eval_mae``: pred (S, T, D), truth (T, D)."""
    med = jnp.median(pred, axis=0)
    return float(jnp.mean(jnp.abs(med - truth)))


def eval_rmse(pred, truth) -> float:
    mean = jnp.mean(pred, axis=0)
    return float(jnp.sqrt(jnp.mean((mean - truth) ** 2)))


def eval_crps(pred, truth) -> float:
    return float(jnp.mean(crps_empirical(pred, truth)))


DEFAULT_METRICS = {"mae": eval_mae, "rmse": eval_rmse, "crps": eval_crps}


def backtest(
    data,
    covariates,
    model_fn: Callable,
    *,
    forecaster_fn=None,
    metrics: Optional[Dict[str, Callable]] = None,
    train_window: Optional[int] = None,
    min_train_window: int = 1,
    test_window: Optional[int] = None,
    min_test_window: int = 1,
    stride: int = 1,
    num_samples: int = 100,
    forecaster_options=None,
    rng_key=None,
) -> List[Dict]:
    """Rolling-origin evaluation (ref ``evaluate.py:backtest``)."""
    from .forecaster import Forecaster

    metrics = metrics or DEFAULT_METRICS
    forecaster_options = dict(forecaster_options or {})
    duration = data.shape[-2]
    if test_window is None:
        test_window = max(min_test_window, duration // 4)
    results = []
    t1 = (
        train_window
        if train_window is not None
        else max(min_train_window, duration - test_window)
    )
    windows = []
    t = t1
    while t + min_test_window <= duration:
        t2 = min(t + test_window, duration)
        windows.append((t, t2))
        t += stride
        if train_window is None:
            break
    for (t_train_end, t_test_end) in windows:
        train_data = data[..., :t_train_end, :]
        train_cov = covariates[:t_train_end]
        test_cov = covariates[:t_test_end]
        model = model_fn()
        forecaster = Forecaster(
            model, train_data, train_cov, **forecaster_options
        )
        pred = forecaster(
            train_data, test_cov, num_samples=num_samples, rng_key=rng_key
        )
        truth = data[..., t_train_end:t_test_end, :]
        result = {
            "t0": 0,
            "t1": t_train_end,
            "t2": t_test_end,
            "train_walltime": None,
            "test_walltime": None,
        }
        for name, fn in metrics.items():
            result[name] = fn(pred, truth)
        results.append(result)
    return results
