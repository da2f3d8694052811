"""Broadcasting-safe advanced indexing compatible with enumeration.

Ref ``pyro/ops/indexing.py`` (``vindex:82``, ``Vindex:200``, ``Index:62``).
``Vindex(x)[..., i, :, j]`` treats the leading ``...`` as batch dims that
broadcast against the (possibly enum-dim-carrying) index tensors — the key
user-facing helper for mixture-component selection under enumeration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _is_batched(arg) -> bool:
    return hasattr(arg, "ndim") and jnp.ndim(arg) > 0


def index(tensor, args):
    """Mimic dims-from-the-right indexing: pad args with full slices on the
    LEFT (ref ``indexing.py:index``)."""
    if not isinstance(args, tuple):
        args = (args,)
    if args and args[0] is Ellipsis:
        args = args[1:]
    args = (slice(None),) * (jnp.ndim(tensor) - len(args)) + args
    return tensor[args]


def vindex(tensor, args):
    """Vectorized advanced indexing with broadcasting semantics
    (ref ``indexing.py:82``; see that docstring for the full contract)."""
    if not isinstance(args, tuple):
        return tensor[args]
    if not args:
        return tensor

    tensor = jnp.asarray(tensor)
    if args[0] is Ellipsis:
        args = args[1:]
        if not args:
            return tensor
        old_event_dim = len(args)
        args = (slice(None),) * (tensor.ndim - len(args)) + args
    else:
        args = args + (slice(None),) * (tensor.ndim - len(args))
        old_event_dim = len(args)
    assert len(args) == tensor.ndim
    if any(a is Ellipsis for a in args):
        raise NotImplementedError("Non-leading Ellipsis is not supported")

    # in simple cases standard advanced indexing broadcasts correctly
    is_standard = True
    if tensor.ndim > old_event_dim and _is_batched(args[0]):
        is_standard = False
    elif any(_is_batched(a) for a in args[1:]):
        is_standard = False
    if is_standard:
        return tensor[args]

    # convert args to use broadcasting semantics
    new_event_dim = sum(isinstance(a, slice) for a in args[-old_event_dim:])
    new_dim = 0
    args = list(args)
    for i, arg in reversed(list(enumerate(args))):
        if isinstance(arg, slice):
            if arg != slice(None):
                raise NotImplementedError(
                    "Nontrivial slices are not supported"
                )
            arg = jnp.arange(tensor.shape[i], dtype=jnp.int32)
            arg = arg.reshape((-1,) + (1,) * new_dim)
            new_dim += 1
        elif _is_batched(arg):
            arg = jnp.reshape(arg, jnp.shape(arg) + (1,) * new_event_dim)
        args[i] = arg
    return tensor[tuple(args)]


class Vindex:
    """Ref ``indexing.py:200``."""

    def __init__(self, tensor):
        self._tensor = tensor

    def __getitem__(self, args):
        return vindex(self._tensor, args)


class Index:
    """Ref ``indexing.py:62``."""

    def __init__(self, tensor):
        self._tensor = tensor

    def __getitem__(self, args):
        return index(self._tensor, args)
