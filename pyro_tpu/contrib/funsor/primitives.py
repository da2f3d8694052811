"""``to_funsor`` / ``to_data`` conversion primitives.

Ref ``pyro/contrib/funsor/handlers/primitives.py``: effectful conversions
between positionally-batched arrays and named funsor terms, consulting
the global :class:`~pyro_tpu.contrib.funsor.runtime.DimStack` when no
explicit mapping is given.  This native version goes one step further
than the reference (which only copies the current global frame): unmapped
batch dims / names are *allocated* fresh bindings on the stack, so a
bare ``to_funsor(x)`` inside a named context always succeeds and a later
``to_data`` round-trips through the same bindings.
"""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp

from pyro_tpu.poutine.runtime import am_i_wrapped, effectful

from . import terms
from .runtime import _DIM_STACK, DimRequest, DimType


def _lookup_dim_to_name(batch_shape):
    """Current bindings for the size>1 batch dims, allocating fresh names
    for any dim not yet bound."""
    requests = OrderedDict(
        (dim, DimRequest(None, DimType.LOCAL))
        for dim in range(-len(batch_shape), 0)
        if batch_shape[dim] > 1
    )
    return _DIM_STACK.allocate(requests)


@effectful(type="to_funsor")
def to_funsor(x, output=None, dim_to_name=None, dim_type=DimType.LOCAL):
    if isinstance(x, terms.Funsor):
        return x
    if dim_to_name is None:
        data = jnp.asarray(x)
        event_ndim = 0 if output is None else len(output.shape)
        batch_shape = data.shape[: data.ndim - event_ndim]
        if any(s > 1 for s in batch_shape):
            dim_to_name = _lookup_dim_to_name(batch_shape)
    assert not dim_to_name or not any(
        isinstance(name, DimRequest) for name in dim_to_name.values()
    )
    return terms.to_funsor(x, output=output, dim_to_name=dim_to_name)


@effectful(type="to_data")
def to_data(x, name_to_dim=None, dim_type=DimType.LOCAL):
    if not isinstance(x, terms.Funsor):
        return x
    if name_to_dim is None and isinstance(x, terms.Tensor) and x.inputs:
        requests = OrderedDict(
            (name, DimRequest(None, dim_type)) for name in x.inputs
        )
        name_to_dim = _DIM_STACK.allocate(requests)
    assert not name_to_dim or not any(
        isinstance(dim, DimRequest) for dim in name_to_dim.values()
    )
    return terms.to_data(x, name_to_dim=name_to_dim)


__all__ = ["to_data", "to_funsor"]

# re-export for parity with the reference module's imports
am_i_wrapped = am_i_wrapped
