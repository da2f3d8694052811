from .autoguide import (
    AutoDelta,
    AutoDiagonalNormal,
    AutoGuide,
    AutoGuideList,
    AutoIAFNormal,
    AutoLowRankMultivariateNormal,
    AutoMultivariateNormal,
    AutoNormal,
    AutoNormalizingFlow,
)
from .elbo import ELBO, JitTrace_ELBO, Trace_ELBO, TraceMeanField_ELBO
from .discrete import infer_discrete
from .abstract_infer import (
    EmpiricalMarginal,
    Marginals,
    TracePosterior,
    TracePredictive,
)
from .importance import (
    CSIS,
    Importance,
    ReweightedWakeSleep,
    psis_diagnostic,
    vectorized_importance_weights,
)
from .inspect import get_dependencies, get_model_relations, render_model
from .losses_extra import EnergyDistance, TraceTailAdaptive_ELBO, Trace_MMD
from .renyi_elbo import RenyiELBO
from .tracetmc_elbo import TraceTMC_ELBO
from .smcfilter import SMCFailed, SMCFilter, SMCState
from .svgd import IMQSteinKernel, RBFSteinKernel, SVGD
from .tracegraph_elbo import TraceGraph_ELBO
from .enum import config_enumerate, get_importance_trace
from .traceenum_elbo import JitTraceEnum_ELBO, TraceEnum_ELBO
from ..distributions.util import enable_validation, is_validation_enabled
from .mcmc import HMC, MCMC, NUTS, RandomWalkKernel, StreamingMCMC
from .predictive import MHResampler, Predictive, WeighedPredictive
from .resampler import Resampler
from .svi import SVI

__all__ = [
    "AutoDelta",
    "AutoDiagonalNormal",
    "AutoGuide",
    "AutoGuideList",
    "AutoIAFNormal",
    "AutoLowRankMultivariateNormal",
    "AutoMultivariateNormal",
    "AutoNormal",
    "AutoNormalizingFlow",
    "CSIS",
    "ELBO",
    "EnergyDistance",
    "IMQSteinKernel",
    "EmpiricalMarginal",
    "Importance",
    "Marginals",
    "TracePosterior",
    "TracePredictive",
    "HMC",
    "JitTraceGraph_ELBO",
    "JitTraceMeanField_ELBO",
    "JitTrace_ELBO",
    "enable_validation",
    "is_validation_enabled",
    "MCMC",
    "MHResampler",
    "Resampler",
    "NUTS",
    "Predictive",
    "RandomWalkKernel",
    "RBFSteinKernel",
    "RenyiELBO",
    "ReweightedWakeSleep",
    "SMCFailed",
    "SMCFilter",
    "SMCState",
    "StreamingMCMC",
    "SVGD",
    "SVI",
    "TraceEnum_ELBO",
    "TraceGraph_ELBO",
    "TraceMeanField_ELBO",
    "TraceTMC_ELBO",
    "TraceTailAdaptive_ELBO",
    "Trace_MMD",
    "Trace_ELBO",
    "WeighedPredictive",
    "config_enumerate",
    "get_importance_trace",
    "get_dependencies",
    "get_model_relations",
    "infer_discrete",
    "psis_diagnostic",
    "render_model",
    "vectorized_importance_weights",
]

# jit aliases (everything compiles via jax.jit in SVI)
JitTraceGraph_ELBO = TraceGraph_ELBO
JitTraceMeanField_ELBO = TraceMeanField_ELBO
