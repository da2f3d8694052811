"""Effect-handler library (capabilities of ``pyro.poutine``).

Public handler list parity target: ``/root/reference/pyro/poutine/__init__.py:31-57``.
"""

from .handlers import (
    BroadcastMessenger,
    EqualizeMessenger,
    broadcast,
    collapse,
    equalize,
    queue,
    BlockMessenger,
    ConditionMessenger,
    DoMessenger,
    EscapeMessenger,
    InferConfigMessenger,
    LiftMessenger,
    MaskMessenger,
    ReplayMessenger,
    ScaleMessenger,
    SeedMessenger,
    SubstituteMessenger,
    TraceHandler,
    TraceMessenger,
    UnconditionMessenger,
    block,
    condition,
    do,
    enum,
    escape,
    infer_config,
    lift,
    mask,
    replay,
    scale,
    seed,
    substitute,
    trace,
    uncondition,
)
from .enum_messenger import EnumMessenger, MarkovMessenger, markov
from .vectorized_markov import VectorizedMarkovMessenger, vectorized_markov
from .guide import GuideMessenger
from .messenger import Messenger, block_messengers
from .plate_messenger import PlateMessenger, plate_stack
from .reparam_messenger import ReparamMessenger, reparam
from .runtime import (
    _DIM_ALLOCATOR,
    _ENUM_ALLOCATOR,
    _PYRO_STACK,
    CondIndepStackFrame,
    NonlocalExit,
    am_i_wrapped,
    apply_stack,
    effectful,
    get_mask,
    get_plates,
)
from .trace_struct import Trace
from .util import prune_subsample_sites, site_is_factor, site_is_subsample

plate = PlateMessenger

__all__ = [
    "broadcast",
    "collapse",
    "equalize",
    "queue",
    "enable_validation",
    "is_validation_enabled",
    "unwrap",
    "CondIndepStackFrame",
    "EnumMessenger",
    "GuideMessenger",
    "MarkovMessenger",
    "Messenger",
    "NonlocalExit",
    "PlateMessenger",
    "Trace",
    "TraceHandler",
    "TraceMessenger",
    "am_i_wrapped",
    "apply_stack",
    "block",
    "block_messengers",
    "condition",
    "do",
    "enum",
    "effectful",
    "escape",
    "get_mask",
    "get_plates",
    "infer_config",
    "lift",
    "markov",
    "vectorized_markov",
    "VectorizedMarkovMessenger",
    "mask",
    "plate",
    "plate_stack",
    "reparam",
    "ReparamMessenger",
    "prune_subsample_sites",
    "replay",
    "scale",
    "seed",
    "site_is_factor",
    "site_is_subsample",
    "substitute",
    "trace",
    "uncondition",
]

from ..distributions.util import enable_validation, is_validation_enabled


def unwrap(fn):
    """Strip handler wrappers to reach the underlying callable
    (ref ``poutine/messenger.py:59``)."""
    while True:
        wrapped = getattr(fn, "__wrapped__", None) or getattr(fn, "fn", None)
        if wrapped is None or wrapped is fn:
            return fn
        fn = wrapped
