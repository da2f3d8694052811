from .loc_scale import LocScaleReparam
from .reparam import Reparam
from .transform import TransformReparam
from .unit_jacobian import UnitJacobianReparam
from .discrete_cosine import DiscreteCosineReparam
from .haar import HaarReparam
from .softmax import GumbelSoftmaxReparam
from .projected_normal import ProjectedNormalReparam
from .split import SplitReparam
from .neutra import NeuTraReparam
from .stable import StableReparam, SymmetricStableReparam
from .strategies import AutoReparam, MinimalReparam

__all__ = [
    "AutoReparam",
    "DiscreteCosineReparam",
    "GumbelSoftmaxReparam",
    "HaarReparam",
    "LocScaleReparam",
    "MinimalReparam",
    "NeuTraReparam",
    "ProjectedNormalReparam",
    "Reparam",
    "SplitReparam",
    "StableReparam",
    "SymmetricStableReparam",
    "TransformReparam",
    "UnitJacobianReparam",
]
