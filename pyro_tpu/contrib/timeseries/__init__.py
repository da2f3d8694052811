"""Time series models (ref ``pyro/contrib/timeseries``)."""

from .base import TimeSeriesModel
from .gp import DependentMaternGP, IndependentMaternGP, LinearlyCoupledMaternGP
from .lgssm import GenericLGSSMWithGPNoiseModel, GenericLGSSM

__all__ = [
    "GenericLGSSMWithGPNoiseModel",
    "DependentMaternGP",
    "GenericLGSSM",
    "IndependentMaternGP",
    "LinearlyCoupledMaternGP",
    "TimeSeriesModel",
]
