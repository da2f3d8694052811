from .elbo import ELBO, JitTrace_ELBO, Trace_ELBO, TraceMeanField_ELBO
from .enum import config_enumerate, get_importance_trace
from .svi import SVI

__all__ = [
    "ELBO",
    "JitTrace_ELBO",
    "SVI",
    "Trace_ELBO",
    "TraceMeanField_ELBO",
    "config_enumerate",
    "get_importance_trace",
]
