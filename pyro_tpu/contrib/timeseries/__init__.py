"""Time series models (ref ``pyro/contrib/timeseries``)."""

from .base import TimeSeriesModel
from .gp import IndependentMaternGP, LinearlyCoupledMaternGP
from .lgssm import GenericLGSSM

__all__ = [
    "GenericLGSSM",
    "IndependentMaternGP",
    "LinearlyCoupledMaternGP",
    "TimeSeriesModel",
]
