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
from .discrete import infer_discrete
from .enum import config_enumerate, get_importance_trace
from .traceenum_elbo import JitTraceEnum_ELBO, TraceEnum_ELBO
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
    "TraceEnum_ELBO",
    "Trace_ELBO",
    "TraceMeanField_ELBO",
    "WeighedPredictive",
    "config_enumerate",
    "get_importance_trace",
    "infer_discrete",
]
