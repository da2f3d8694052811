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
from .hmm import LinearHMMReparam
from .conjugate import ConjugateReparam
from .structured import StructuredReparam
from .stable import LatentStableReparam, StableReparam, SymmetricStableReparam
from .studentt import StudentTReparam
from .strategies import AutoReparam, MinimalReparam

__all__ = [
    "ConjugateReparam",
    "LatentStableReparam",
    "StructuredReparam",
    "AutoReparam",
    "DiscreteCosineReparam",
    "GumbelSoftmaxReparam",
    "HaarReparam",
    "LinearHMMReparam",
    "LocScaleReparam",
    "MinimalReparam",
    "NeuTraReparam",
    "ProjectedNormalReparam",
    "Reparam",
    "SplitReparam",
    "StableReparam",
    "StudentTReparam",
    "SymmetricStableReparam",
    "TransformReparam",
    "UnitJacobianReparam",
]
