"""Polyphonic music data utilities (ref
``pyro/contrib/examples/polyphonic_data_loader.py``).

The JSB chorales download is gated; the sequence utilities
(``get_mini_batch`` padding/masking/reversal) are local and generic.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .util import get_data_loader  # noqa: F401  (gated download)


def load_data(dataset="jsb_chorales", data_dir=None):
    raise RuntimeError(
        "Downloading polyphonic datasets requires network access, which "
        "is unavailable here; supply sequences directly to get_mini_batch."
    )


def reverse_sequences(mini_batch, seq_lengths):
    """Reverse each sequence along time, respecting its length (ref
    ``polyphonic_data_loader.py:reverse_sequences``)."""
    T = mini_batch.shape[1]
    idx = jnp.arange(T)
    rev = seq_lengths[:, None] - 1 - idx[None, :]
    rev = jnp.clip(rev, 0)
    keep = idx[None, :] < seq_lengths[:, None]
    gathered = jnp.take_along_axis(
        mini_batch, rev[..., None].astype(jnp.int32), axis=1
    )
    return jnp.where(keep[..., None], gathered, mini_batch)


def get_mini_batch_mask(mini_batch, seq_lengths):
    T = mini_batch.shape[1]
    return (
        jnp.arange(T)[None, :] < jnp.asarray(seq_lengths)[:, None]
    ).astype(mini_batch.dtype)


def get_mini_batch(mini_batch_indices, sequences, seq_lengths, cuda=False):
    """Sort a minibatch by decreasing length and build masks + reversed
    copies (ref ``polyphonic_data_loader.py:get_mini_batch``)."""
    seq_lengths = np.asarray(seq_lengths)[np.asarray(mini_batch_indices)]
    sorted_idx = np.argsort(-seq_lengths)
    mini_batch = jnp.asarray(sequences)[jnp.asarray(mini_batch_indices)][
        jnp.asarray(sorted_idx)
    ]
    seq_lengths = jnp.asarray(seq_lengths[sorted_idx])
    T = int(seq_lengths.max())
    mini_batch = mini_batch[:, :T]
    mini_batch_reversed = reverse_sequences(mini_batch, seq_lengths)
    mini_batch_mask = get_mini_batch_mask(mini_batch, seq_lengths)
    return mini_batch, mini_batch_reversed, mini_batch_mask, seq_lengths
