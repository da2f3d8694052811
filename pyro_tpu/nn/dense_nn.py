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


class MaskedLinear:
    """Linear layer whose weight is elementwise-masked (ref
    ``pyro/nn/auto_reg_nn.py:MaskedLinear``); the building block of MADE.
    Parameters live in the param store under ``name``."""

    def __init__(self, name, in_features, out_features, mask, bias=True):
        import numpy as np

        self.name = name
        self.mask = jnp.asarray(mask)
        assert self.mask.shape == (out_features, in_features)
        rs = np.random.RandomState(abs(hash(name)) % (2**31))
        bound = 1.0 / np.sqrt(in_features)
        self._w_init = jnp.asarray(
            rs.uniform(-bound, bound, (out_features, in_features)),
            jnp.float32,
        )
        self._b_init = (
            jnp.asarray(
                rs.uniform(-bound, bound, (out_features,)), jnp.float32
            )
            if bias
            else None
        )

    def __call__(self, x):
        import pyro_tpu as pyro

        w = pyro.param(f"{self.name}.weight", self._w_init)
        out = x @ (w * self.mask).T
        if self._b_init is not None:
            out = out + pyro.param(f"{self.name}.bias", self._b_init)
        return out
