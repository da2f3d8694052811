"""Packed named-dim tensors for the enumeration engine.

Ref ``pyro/ops/packed.py``.  The reference attaches ``._pyro_dims`` strings
to raw tensors; JAX arrays are immutable and attribute-less, so here a
``PackedTensor`` wrapper pairs an array with its dims string (one symbol per
axis, rightmost axis last).  Size-1 axes are squeezed on packing.
"""

from __future__ import annotations

from typing import Dict, Iterable, Optional

import jax
import jax.numpy as jnp


class PackedTensor:
    """An array whose every axis is named by a single-character symbol."""

    __slots__ = ("value", "dims")

    def __init__(self, value, dims: str):
        assert jnp.ndim(value) == len(dims), (jnp.shape(value), dims)
        self.value = value
        self.dims = dims

    @property
    def shape(self):
        return jnp.shape(self.value)

    def size(self, dim_symbol: str) -> int:
        return self.shape[self.dims.index(dim_symbol)]

    def __repr__(self):
        return f"PackedTensor(dims='{self.dims}', shape={self.shape})"

    # identity hashing so PackedTensors can key dicts (as in the reference's
    # use of tensors as keys in _partition_terms)
    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def pack(value, dim_to_symbol: Dict[int, str]) -> PackedTensor:
    """Convert a broadcast-shaped tensor to a packed named tensor
    (ref ``packed.py:12``): squeeze size-1 dims, name the rest."""
    value = jnp.asarray(value)
    shape = value.shape
    dims = []
    keep_axes = []
    for i, size in enumerate(shape):
        d = i - len(shape)  # negative dim
        if size == 1:
            continue
        if d not in dim_to_symbol:
            raise ValueError(
                f"invalid shape {shape}: dim {d} (size {size}) is not "
                "allocated to a plate or enum site; try wrapping batched "
                "dims in a plate or using .to_event()"
            )
        dims.append(dim_to_symbol[d])
        keep_axes.append(i)
    squeezed = value.reshape([shape[i] for i in keep_axes])
    return PackedTensor(squeezed, "".join(dims))


def unpack(packed: PackedTensor, symbol_to_dim: Dict[str, int]):
    """Expand a packed tensor back to broadcast shape (ref ``packed.py:51``)."""
    if not packed.dims:
        return packed.value
    min_dim = min(symbol_to_dim[d] for d in packed.dims)
    shape = [1] * (-min_dim)
    for d, size in zip(packed.dims, packed.shape):
        shape[symbol_to_dim[d]] = size
    # permute axes into dim order
    order = sorted(range(len(packed.dims)), key=lambda i: symbol_to_dim[packed.dims[i]])
    value = jnp.transpose(packed.value, order)
    return value.reshape(shape)


def broadcast_all(*parts: PackedTensor):
    """Broadcast packed tensors to a common dims set (ref ``packed.py``)."""
    sizes: Dict[str, int] = {}
    for p in parts:
        for d, s in zip(p.dims, p.shape):
            sizes[d] = s
    dims = "".join(sorted(sizes))
    out = []
    for p in parts:
        out.append(align(p, dims, sizes))
    return tuple(out)


def align(p: PackedTensor, target_dims: str, sizes: Optional[Dict[str, int]] = None) -> PackedTensor:
    """Permute/reshape (not tile) to have exactly ``target_dims`` (size-1 on
    missing dims)."""
    assert set(p.dims) <= set(target_dims)
    order = sorted(range(len(p.dims)), key=lambda i: target_dims.index(p.dims[i]))
    value = jnp.transpose(p.value, order)
    shape = []
    j = 0
    ordered_dims = [p.dims[i] for i in order]
    for d in target_dims:
        if j < len(ordered_dims) and ordered_dims[j] == d:
            shape.append(value.shape[j])
            j += 1
        else:
            shape.append(1)
    return PackedTensor(value.reshape(shape), target_dims)


def neg(p: PackedTensor) -> PackedTensor:
    return PackedTensor(-p.value, p.dims)


def scale_and_mask(p: PackedTensor, scale=1.0, mask: Optional[PackedTensor] = None) -> PackedTensor:
    """Ref ``packed.py:scale_and_mask``."""
    from ..distributions.util import is_identically_one

    if is_identically_one(scale) and mask is None:
        return p
    if mask is None:
        return PackedTensor(p.value * scale, p.dims)
    m, v = broadcast_all(mask, p)
    return PackedTensor(jnp.where(m.value, v.value * scale, 0.0), v.dims)


def gather(p: PackedTensor, index: PackedTensor, dim_symbol: str) -> PackedTensor:
    """Select along a named dim with a named index tensor (ref
    ``packed.py:gather``)."""
    target_dims = "".join(
        sorted(set(p.dims + index.dims) - {dim_symbol})
    )
    sizes = dict(zip(p.dims, p.shape))
    sizes.update(zip(index.dims, index.shape))
    full = dim_symbol + target_dims
    pv = align(p, full).value
    iv = align(index, target_dims).value
    out = jnp.take_along_axis(pv, iv[None].astype(jnp.int32), axis=0)[0]
    # out may still have size-1 axes where index/p were missing dims
    keep_dims = []
    keep_axes = []
    for i, d in enumerate(target_dims):
        if out.shape[i] != 1:
            keep_dims.append(d)
            keep_axes.append(i)
    return PackedTensor(
        out.reshape([out.shape[i] for i in keep_axes]), "".join(keep_dims)
    )
