"""Recurrent conditioner networks (``lax.scan`` RNN/GRU/LSTM).

The reference's amortized guides condition on sequence summaries produced
by ``torch.nn.RNN``/``GRU``/``LSTM`` (e.g. the DMM guide's 600-wide
backward RNN over future observations, ref ``examples/dmm.py:173-181``,
and ``pyro.nn`` usage throughout contrib).  This module is the TPU-native
equivalent: a flax module that runs a recurrent cell over time with
``jax.lax.scan``.

TPU-first design notes:

- **Input projections are hoisted out of the scan.**  For every layer,
  ``x @ W_ih`` over all T steps is computed as ONE (B*T, I) x (I, G*H)
  matmul before the scan — a large MXU-shaped contraction — so the scan
  body only carries the unavoidable recurrent matmul ``h @ W_hh``.
  This is the standard cuDNN trick, and on TPU it matters more: the
  per-step input GEMM would otherwise be too small to tile well.
- **Time-major inside the scan** (``lax.scan`` consumes the leading
  axis); the public API is batch-first like torch's ``batch_first=True``.
- **Static shapes**: T is a trace-time constant; masking handles ragged
  sequences (carry the previous hidden state through padded steps), so
  no dynamic shapes reach XLA.

Weight layout and gate order match torch (``W_ih: (G*H, I)``,
``W_hh: (G*H, H)``, GRU gates r,z,n; LSTM gates i,f,g,o; init
U(-1/sqrt(H), 1/sqrt(H))), so parity tests can load torch weights
verbatim.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

try:
    import flax.linen as nn
except ImportError:  # pragma: no cover
    nn = None

_GATES = {"relu": 1, "tanh": 1, "gru": 3, "lstm": 4}


def _uniform_init(scale):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)

    return init


class RNN(nn.Module):
    """Multi-layer recurrent network over a batch-first sequence.

    Args:
        features: hidden size H.
        cell: one of ``"relu"``/``"tanh"`` (Elman RNN, as
            ``torch.nn.RNN(nonlinearity=...)``), ``"gru"``, ``"lstm"``.
        num_layers: stacked layers (layer l consumes layer l-1's outputs).
        reverse: process the sequence right-to-left.  Outputs stay
            aligned with the *input* time indices, so ``out[:, t]``
            summarizes ``x[:, t:]`` — exactly the reference DMM guide's
            use of a backward RNN over future observations.

    Call: ``rnn(x, h0=None, mask=None)`` with ``x: (B, T, I)``,
    optional ``h0: (num_layers, B, H)`` (or ``(h0, c0)`` tuple for
    LSTM), optional boolean ``mask: (B, T)`` — padded steps carry the
    previous hidden state through unchanged.  Returns
    ``(outputs (B, T, H), final_state)`` where ``final_state`` is
    ``(num_layers, B, H)`` (or a tuple of two for LSTM).
    """

    features: int
    cell: str = "gru"
    num_layers: int = 1
    reverse: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        h0=None,
        mask: Optional[jnp.ndarray] = None,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.cell not in _GATES:
            raise ValueError(f"unknown cell {self.cell!r}")
        H, G = self.features, _GATES[self.cell]
        B, T, _ = x.shape
        is_lstm = self.cell == "lstm"

        if h0 is None:
            h_layers = [jnp.zeros((B, H), x.dtype)] * self.num_layers
            c_layers = [jnp.zeros((B, H), x.dtype)] * self.num_layers
        elif is_lstm and isinstance(h0, tuple):
            h_layers = [h0[0][l] for l in range(self.num_layers)]
            c_layers = [h0[1][l] for l in range(self.num_layers)]
        else:
            h_layers = [h0[l] for l in range(self.num_layers)]
            c_layers = [jnp.zeros((B, H), x.dtype)] * self.num_layers

        if mask is not None:
            mask_tm = jnp.swapaxes(mask, 0, 1)[..., None]  # (T, B, 1)

        out = x
        finals_h, finals_c = [], []
        for layer in range(self.num_layers):
            I = out.shape[-1]
            k = 1.0 / jnp.sqrt(jnp.asarray(H, jnp.float32))
            w_ih = self.param(f"w_ih_l{layer}", _uniform_init(k), (G * H, I))
            w_hh = self.param(f"w_hh_l{layer}", _uniform_init(k), (G * H, H))
            b_ih = self.param(f"b_ih_l{layer}", _uniform_init(k), (G * H,))
            b_hh = self.param(f"b_hh_l{layer}", _uniform_init(k), (G * H,))

            # hoisted input projection: one big MXU matmul over all T
            xp = out.reshape(B * T, I) @ w_ih.T + b_ih
            xp = xp.reshape(B, T, G * H)
            xp = jnp.swapaxes(xp, 0, 1)  # time-major (T, B, G*H)

            def step(carry, inp, _w_hh=w_hh, _b_hh=b_hh):
                h_prev, c_prev = carry
                if mask is None:
                    xg = inp
                    m = None
                else:
                    xg, m = inp
                hp = h_prev @ _w_hh.T + _b_hh
                if self.cell == "relu":
                    h_new = jax.nn.relu(xg + hp)
                    c_new = c_prev
                elif self.cell == "tanh":
                    h_new = jnp.tanh(xg + hp)
                    c_new = c_prev
                elif self.cell == "gru":
                    xr, xz, xn = jnp.split(xg, 3, axis=-1)
                    hr, hz, hn = jnp.split(hp, 3, axis=-1)
                    r = jax.nn.sigmoid(xr + hr)
                    z = jax.nn.sigmoid(xz + hz)
                    n_ = jnp.tanh(xn + r * hn)
                    h_new = (1.0 - z) * n_ + z * h_prev
                    c_new = c_prev
                else:  # lstm
                    xi, xf, xg_, xo = jnp.split(xg, 4, axis=-1)
                    hi, hf, hg, ho = jnp.split(hp, 4, axis=-1)
                    i = jax.nn.sigmoid(xi + hi)
                    f = jax.nn.sigmoid(xf + hf)
                    g = jnp.tanh(xg_ + hg)
                    o = jax.nn.sigmoid(xo + ho)
                    c_new = f * c_prev + i * g
                    h_new = o * jnp.tanh(c_new)
                if m is not None:
                    h_new = jnp.where(m, h_new, h_prev)
                    c_new = jnp.where(m, c_new, c_prev)
                return (h_new, c_new), h_new

            xs = xp if mask is None else (xp, mask_tm)
            (h_fin, c_fin), ys = jax.lax.scan(
                step,
                (h_layers[layer], c_layers[layer]),
                xs,
                reverse=self.reverse,
            )
            finals_h.append(h_fin)
            finals_c.append(c_fin)
            out = jnp.swapaxes(ys, 0, 1)  # back to (B, T, H)

        final_h = jnp.stack(finals_h)
        if is_lstm:
            return out, (final_h, jnp.stack(finals_c))
        return out, final_h


class GRUCell(nn.Module):
    """Single-step GRU cell (torch ``nn.GRUCell`` layout/gate order)."""

    features: int

    @nn.compact
    def __call__(self, h, x):
        H = self.features
        k = 1.0 / jnp.sqrt(jnp.asarray(H, jnp.float32))
        w_ih = self.param("w_ih", _uniform_init(k), (3 * H, x.shape[-1]))
        w_hh = self.param("w_hh", _uniform_init(k), (3 * H, H))
        b_ih = self.param("b_ih", _uniform_init(k), (3 * H,))
        b_hh = self.param("b_hh", _uniform_init(k), (3 * H,))
        xr, xz, xn = jnp.split(x @ w_ih.T + b_ih, 3, axis=-1)
        hr, hz, hn = jnp.split(h @ w_hh.T + b_hh, 3, axis=-1)
        r = jax.nn.sigmoid(xr + hr)
        z = jax.nn.sigmoid(xz + hz)
        n_ = jnp.tanh(xn + r * hn)
        return (1.0 - z) * n_ + z * h


__all__ = ["RNN", "GRUCell"]
