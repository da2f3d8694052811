"""Forecasting framework (ref ``pyro/contrib/forecast``)."""

from .evaluate import backtest, eval_crps, eval_mae, eval_rmse
from .forecaster import HMCForecaster, Forecaster, ForecastingModel

__all__ = [
    "HMCForecaster",
    "Forecaster",
    "ForecastingModel",
    "backtest",
    "eval_crps",
    "eval_mae",
    "eval_rmse",
]
