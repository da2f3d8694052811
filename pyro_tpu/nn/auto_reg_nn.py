"""Autoregressive conditioner networks (MADE).

Ref ``pyro/nn/auto_reg_nn.py`` (AutoRegressiveNN / MADE masks, Germain et
al. 2015).  Implemented as flax modules; bind parameters into the pyro
param store via ``pyro_tpu.nn.flax_module``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None


def create_mask(input_dim, context_dim, hidden_dims, permutation, output_multiplier):
    """Create MADE masks (ref ``auto_reg_nn.py:create_mask``)."""
    # degrees
    input_degrees = np.asarray(permutation) + 1  # 1..D
    hidden_degrees = []
    prev = input_degrees
    for h in hidden_dims:
        # spread hidden degrees in [1, D-1]
        deg = (np.arange(h) % max(1, input_dim - 1)) + 1
        hidden_degrees.append(deg)
    masks = []
    # input (+context) -> first hidden
    in_deg = np.concatenate(
        [np.zeros(context_dim, dtype=int), input_degrees]
    )
    prev_deg = in_deg
    for deg in hidden_degrees:
        masks.append((deg[:, None] >= prev_deg[None, :]).astype(np.float32))
        prev_deg = deg
    # last hidden -> output (output_multiplier * D)
    out_deg = np.tile(input_degrees, output_multiplier)
    mask_out = (out_deg[:, None] > prev_deg[None, :]).astype(np.float32)
    return masks, mask_out


class MaskedLinear(nn.Module):
    features: int
    mask: np.ndarray  # (features, in_features)

    @nn.compact
    def __call__(self, x):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        masked = kernel * jnp.asarray(self.mask).T
        return x @ masked + bias


class AutoRegressiveNN(nn.Module):
    """MADE producing ``param_dims`` outputs per input dim
    (ref ``auto_reg_nn.py:AutoRegressiveNN``)."""

    input_dim: int
    hidden_dims: Sequence[int]
    param_dims: Sequence[int] = (1, 1)
    permutation: Optional[Sequence[int]] = None
    skip_connections: bool = False
    context_dim: int = 0

    def setup(self):
        perm = (
            np.arange(self.input_dim)
            if self.permutation is None
            else np.asarray(self.permutation)
        )
        self._perm = perm
        self.output_multiplier = sum(self.param_dims)
        masks, mask_out = create_mask(
            self.input_dim,
            self.context_dim,
            self.hidden_dims,
            perm,
            self.output_multiplier,
        )
        layers = []
        for h, m in zip(self.hidden_dims, masks):
            layers.append(MaskedLinear(h, m))
        self.hidden_layers = layers
        self.output_layer = MaskedLinear(
            self.input_dim * self.output_multiplier, mask_out
        )

    def __call__(self, x, context=None):
        h = x if context is None else jnp.concatenate(
            [jnp.broadcast_to(context, x.shape[:-1] + context.shape[-1:]), x],
            axis=-1,
        )
        for layer in self.hidden_layers:
            h = nn.relu(layer(h))
        out = self.output_layer(h)
        if self.output_multiplier == 1:
            return out
        # split into per-param outputs: (..., multiplier, D) -> tuple
        out = out.reshape(out.shape[:-1] + (self.output_multiplier, self.input_dim))
        outs = []
        start = 0
        for pd in self.param_dims:
            if pd == 1:
                outs.append(out[..., start, :])
            else:
                outs.append(out[..., start : start + pd, :])
            start += pd
        return tuple(outs) if len(outs) > 1 else outs[0]


class ConditionalAutoRegressiveNN(AutoRegressiveNN):
    """MADE with conditioning context (ref ``auto_reg_nn.py``)."""

    def __call__(self, x, context):
        return super().__call__(x, context=context)
