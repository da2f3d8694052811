from .autoguide import (
    AutoDelta,
    AutoDiagonalNormal,
    AutoGuide,
    AutoGuideList,
    AutoLowRankMultivariateNormal,
    AutoMultivariateNormal,
    AutoNormal,
)
from .elbo import ELBO, JitTrace_ELBO, Trace_ELBO, TraceMeanField_ELBO
from .enum import config_enumerate, get_importance_trace
from .mcmc import HMC, MCMC, NUTS
from .predictive import MHResampler, Predictive, WeighedPredictive
from .svi import SVI

__all__ = [
    "AutoDelta",
    "AutoDiagonalNormal",
    "AutoGuide",
    "AutoGuideList",
    "AutoLowRankMultivariateNormal",
    "AutoMultivariateNormal",
    "AutoNormal",
    "ELBO",
    "HMC",
    "JitTrace_ELBO",
    "MCMC",
    "MHResampler",
    "NUTS",
    "Predictive",
    "SVI",
    "Trace_ELBO",
    "TraceMeanField_ELBO",
    "WeighedPredictive",
    "config_enumerate",
    "get_importance_trace",
]
