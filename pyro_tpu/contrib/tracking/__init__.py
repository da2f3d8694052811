"""Multi-object tracking (ref ``pyro/contrib/tracking``)."""

from .assignment import MarginalAssignment, MarginalAssignmentPersistent
from .extended_kalman_filter import EKFState, NcvContinuous
from .hashing import LSH, merge_points
from .measurements import PositionMeasurement

__all__ = [
    "EKFState",
    "NcvContinuous",
    "LSH",
    "MarginalAssignment",
    "MarginalAssignmentPersistent",
    "PositionMeasurement",
    "merge_points",
]
