"""Multi-object tracking (ref ``pyro/contrib/tracking``)."""

from . import dynamic_models, measurements
from .assignment import MarginalAssignment, MarginalAssignmentPersistent
from .distributions import EKFDistribution
from .dynamic_models import (
    DynamicModel,
    DifferentiableDynamicModel,
    Ncp,
    NcpContinuous,
    NcpDiscrete,
    Ncv,
    NcvContinuous,
    NcvDiscrete,
)
from .extended_kalman_filter import EKFState
from .hashing import LSH, merge_points
from .measurements import PositionMeasurement

__all__ = [
    "DifferentiableDynamicModel",
    "DynamicModel",
    "EKFDistribution",
    "EKFState",
    "LSH",
    "MarginalAssignment",
    "MarginalAssignmentPersistent",
    "Ncp",
    "NcpContinuous",
    "NcpDiscrete",
    "Ncv",
    "NcvContinuous",
    "NcvDiscrete",
    "PositionMeasurement",
    "merge_points",
]
