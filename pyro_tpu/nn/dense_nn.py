"""Dense conditioner networks (ref ``pyro/nn/dense_nn.py``)."""

from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None


class DenseNN(nn.Module):
    """MLP emitting ``param_dims`` outputs (ref ``dense_nn.py:DenseNN``)."""

    input_dim: int
    hidden_dims: Sequence[int]
    param_dims: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        h = x
        for hd in self.hidden_dims:
            h = nn.relu(nn.Dense(hd)(h))
        total = sum(self.param_dims)
        out = nn.Dense(total)(h)
        if len(self.param_dims) == 1:
            return out
        outs = []
        start = 0
        for pd in self.param_dims:
            outs.append(out[..., start : start + pd])
            start += pd
        return tuple(outs)


class ConditionalDenseNN(nn.Module):
    """MLP on [x, context] (ref ``dense_nn.py:ConditionalDenseNN``)."""

    input_dim: int
    context_dim: int
    hidden_dims: Sequence[int]
    param_dims: Sequence[int] = (1, 1)

    @nn.compact
    def __call__(self, x, context):
        context = jnp.broadcast_to(
            context, x.shape[:-1] + context.shape[-1:]
        )
        h = jnp.concatenate([x, context], axis=-1)
        for hd in self.hidden_dims:
            h = nn.relu(nn.Dense(hd)(h))
        total = sum(self.param_dims)
        out = nn.Dense(total)(h)
        if len(self.param_dims) == 1:
            return out
        outs = []
        start = 0
        for pd in self.param_dims:
            outs.append(out[..., start : start + pd])
            start += pd
        return tuple(outs)
