from . import (
    dual_averaging,
    gaussian,
    indexing,
    integrator,
    packed,
    special,
    stats,
    streaming,
    tensor_utils,
    welford,
)
from .indexing import Index, Vindex, index, vindex

__all__ = [
    "Index",
    "Vindex",
    "dual_averaging",
    "gaussian",
    "index",
    "indexing",
    "integrator",
    "packed",
    "special",
    "stats",
    "streaming",
    "tensor_utils",
    "vindex",
    "welford",
]
