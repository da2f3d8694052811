"""Tensor utilities shared by contrib modules (ref
``pyro/contrib/util.py``): dict/tensor packing by named index ranges and
right/left-expansion helpers used throughout OED and GLMM code."""

from __future__ import annotations

from collections import OrderedDict

import jax.numpy as jnp


def get_indices(labels, sizes=None, tensors=None):
    """Column index ranges for ``labels`` inside a concatenation laid out
    by ``sizes`` (or by the widths of ``tensors``) — ref ``util.py:12``."""
    if sizes is None:
        sizes = OrderedDict(
            (l, t.shape[-1]) for l, t in tensors.items()
        )
    indices = []
    start = 0
    for label, size in sizes.items():
        end = start + size
        if label in labels:
            indices.extend(range(start, end))
        start = end
    return jnp.asarray(indices, jnp.int32)


def tensor_to_dict(sizes, tensor, subset=None):
    """Split the last dim of ``tensor`` into named chunks
    (ref ``util.py:25``)."""
    out = {}
    start = 0
    for label, size in sizes.items():
        end = start + size
        if subset is None or label in subset:
            out[label] = tensor[..., start:end]
        start = end
    return out


def rmm(A, B):
    """Batched matrix-matrix product (ref ``util.py:38``)."""
    return jnp.matmul(A, B)


def rmv(A, b):
    """Batched matrix-vector product (ref ``util.py:43``)."""
    return jnp.matmul(A, b[..., None])[..., 0]


def rvv(a, b):
    """Batched inner product (ref ``util.py:48``)."""
    return jnp.sum(a * b, axis=-1)


def lexpand(A, *dimensions):
    """Expand with new leading dimensions (ref ``util.py:53``)."""
    A = jnp.asarray(A)
    return jnp.broadcast_to(
        A.reshape((1,) * len(dimensions) + A.shape),
        tuple(dimensions) + A.shape,
    )


def rexpand(A, *dimensions):
    """Expand with new trailing dimensions (ref ``util.py:58``)."""
    A = jnp.asarray(A)
    return jnp.broadcast_to(
        A.reshape(A.shape + (1,) * len(dimensions)),
        A.shape + tuple(dimensions),
    )


def rdiag(v):
    """Diagonal matrix from the rightmost dim (ref ``util.py:63``)."""
    return v[..., None] * jnp.eye(v.shape[-1], dtype=v.dtype)


def rtril(M, diagonal=0, upper=False):
    """Batched lower- (or upper-) triangular part (ref ``util.py:68``)."""
    if upper:
        return jnp.triu(M, k=diagonal)
    return jnp.tril(M, k=diagonal)


def iter_plates_to_shape(shape):
    """Nested plates matching ``shape`` left-to-right
    (ref ``util.py:75``)."""
    from .. import primitives as pyro

    return [
        pyro.plate(f"plate_{i}", s, dim=i - len(shape))
        for i, s in enumerate(shape)
    ]
