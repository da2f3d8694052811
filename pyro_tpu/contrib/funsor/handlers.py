"""Effect handlers for the funsor frontend.

Ref ``pyro/contrib/funsor/handlers/__init__.py``: the funsor backend's
handler namespace.  In the reference, enum/plate/markov are *re-built* on
funsor terms because torch-pyro's stock handlers cannot allocate dims at
trace time; pyro_tpu's native handlers already do static trace-time dim
allocation (``poutine/enum_messenger.py``, ``poutine/vectorized_markov.py``)
and run the same tensor-variable-elimination semantics on XLA, so this
namespace re-exports them and adds the funsor-specific pieces:

  * :func:`named` — a context that scopes fresh name<->dim bindings on
    the global :class:`DimStack` (ref ``named_messenger.NamedMessenger``)
    for ``to_funsor`` / ``to_data`` round-trips.
  * ``to_funsor`` / ``to_data`` effectful primitives.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyro_tpu.poutine import (  # noqa: F401
    block,
    condition,
    do,
    enum,
    escape,
    infer_config,
    markov,
    mask,
    plate,
    queue,
    replay,
    reparam,
    scale,
    seed,
    trace,
    uncondition,
    vectorized_markov,
)

from .primitives import to_data, to_funsor  # noqa: F401
from .runtime import _DIM_STACK, StackFrame


@contextmanager
def named(first_available_dim=None):
    """Scope a fresh global name<->dim frame (ref ``NamedMessenger``):
    bindings allocated inside — by ``to_funsor``/``to_data`` or explicit
    ``DimStack.allocate`` calls — are discarded on exit, and
    ``first_available_dim`` caps where non-visible dims start."""
    frame = StackFrame(history=0)
    old_first = _DIM_STACK.set_first_available_dim(
        first_available_dim
        if first_available_dim is not None
        else _DIM_STACK.DEFAULT_FIRST_DIM
    )
    # the same frame serves as both the scoped global frame and the LOCAL
    # write target, so every allocation made inside is dropped on exit
    _DIM_STACK.push_global(frame)
    _DIM_STACK.push_local(frame)
    try:
        yield frame
    finally:
        assert _DIM_STACK.pop_local() is frame
        assert _DIM_STACK.pop_global() is frame
        _DIM_STACK.set_first_available_dim(old_first)


__all__ = [
    "block",
    "condition",
    "do",
    "enum",
    "escape",
    "infer_config",
    "markov",
    "mask",
    "named",
    "plate",
    "queue",
    "replay",
    "reparam",
    "scale",
    "seed",
    "to_data",
    "to_funsor",
    "trace",
    "uncondition",
    "vectorized_markov",
]
