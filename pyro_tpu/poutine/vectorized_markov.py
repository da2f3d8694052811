"""Vectorized Markov chains: enumeration over time without Python unrolling.

Ref ``pyro/contrib/funsor/handlers/plate_messenger.py:188``
(``VectorizedMarkovMessenger``).  The reference implements this on top of
funsor; here it is native: the messenger records which sample sites form
Markov chains over a *tensorized* time dimension, and
``TraceEnum_ELBO`` eliminates that dimension with an O(log T)
parallel-scan ``logmatmulexp`` product (``ops/markov_product.py``)
instead of unrolling T Python steps — time becomes one batched axis of
MXU-sized contractions.

Protocol (identical to the reference's):

* the ``for`` loop yields ``history`` Python ints (``0..history-1``) to
  initiate the chain, then ``history+1`` index arrays
  ``arange(i, size-history+i)`` — one pass per chain "slot".  Each index
  array is a :class:`_MarkovIndex`: a NumPy integer array whose
  ``str()``/``format()`` is the stable token ``str(slice(i, size-history+i))``
  — independent of dtype and print options, so ``f"x_{t}"`` site names
  never ellipsize at large T (the reference renames by slice tuple,
  ``plate_messenger.py:230-260``; here the yielded object *formats as*
  the slice, so no renaming is needed).
* sites sampled during the array passes must embed the yielded index in
  their name (``f"x_{t}"``), giving them a ``slice`` suffix directly;
  all but the final pass are auxiliary (``_do_not_score``) — they exist
  so the final pass's distributions can depend on a *previous-state*
  enumerated variable.
* after the loop, sites whose final-pass log-density depends on an
  auxiliary variable's enumeration dim are identified as Markov
  variables and a ``markov_chain`` record is added to the trace:
  ``frozenset{("x_0", "x_slice(0, T-1, None)", "x_slice(1, T, None)")}``.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..distributions.util import broadcast_shape
from .messenger import Messenger
from .runtime import effectful


class _MarkovIndex(np.ndarray):
    """Integer index array yielded by :func:`vectorized_markov` whose
    ``str()`` is the stable token ``str(slice(start, stop, None))``.

    A NumPy subclass (rather than a jax array) so it is a valid index
    into both jax and numpy arrays while carrying a custom ``__str__``:
    site names built as ``f"x_{t}"`` embed the slice token directly,
    independent of dtype or ``np.printoptions`` (no ellipsis at large T).
    Derived arrays (``t - 1``, slices, ufunc results) drop the token and
    print normally.
    """

    def __new__(cls, sl: slice):
        arr = np.arange(sl.start, sl.stop).view(cls)
        arr._token = str(sl)
        return arr

    def __array_finalize__(self, obj):
        # views/ufunc results are plain index arrays: no token
        self._token = None

    def __str__(self):
        token = getattr(self, "_token", None)
        return super().__str__() if token is None else token

    def __repr__(self):
        token = getattr(self, "_token", None)
        return super().__repr__() if token is None else token


@effectful(type="markov_chain")
def _markov_chain(chain=frozenset()):
    """Record Markov-chain structure in the trace (value = the chain)."""
    return chain


class VectorizedMarkovMessenger(Messenger):
    """Ref ``contrib/funsor/handlers/plate_messenger.py:188``."""

    def __init__(self, name=None, size=None, dim=None, history=1):
        if name is None or size is None:
            raise ValueError("vectorized_markov requires name= and size=")
        if size <= 0:
            raise ValueError(f"vectorized_markov size must be positive, got {size}")
        self.name = name
        self.size = size
        self.dim = dim
        self.history = history
        super().__init__()

    def __iter__(self):
        self._aux_infer = {}  # aux site name -> its infer dict
        self._aux_var = {}  # aux site name -> markov var prefix
        self._markov_vars = set()
        self._suffixes = list(range(min(self.history, self.size)))
        self._suffix = None
        for i in self._suffixes:
            self._suffix = i
            yield i
        n_vec = self.size - self.history
        if n_vec <= 0:  # degenerate: fully covered by the int yields
            return
        from .plate_messenger import PlateMessenger

        time_slices = [
            slice(i, n_vec + i) for i in range(self.history + 1)
        ]
        self._suffixes.extend(time_slices)
        with self:
            with PlateMessenger(
                name=self.name, size=n_vec, dim=self.dim
            ):
                for sl in time_slices:
                    self._suffix = sl
                    self._suffix_str = str(sl)
                    yield _MarkovIndex(sl)
        chain = frozenset(
            tuple(f"{var}{suffix}" for suffix in self._suffixes)
            for var in sorted(self._markov_vars)
        )
        _markov_chain(
            chain,
            name=f"_markov_chain_{self.name}",
            infer={
                "history": self.history,
                "size": self.size,
                "plate_name": self.name,
            },
        )

    def _pyro_sample(self, msg):
        if type(msg["fn"]).__name__ == "_Subsample":
            return
        assert isinstance(self._suffix, slice)
        if not msg["name"].endswith(self._suffix_str):
            raise ValueError(
                "sites inside vectorized_markov must embed the yielded "
                f"index in their name (e.g. f'x_{{t}}'); got {msg['name']!r}"
            )
        if self._suffix != self._suffixes[-1]:
            # auxiliary pass: traced (for dim bookkeeping and so the final
            # pass can reference its enumerated value) but never scored
            msg["infer"]["_do_not_score"] = True
            var = msg["name"][: -len(str(self._suffix))]
            self._aux_var[msg["name"]] = var
            self._aux_infer[msg["name"]] = msg["infer"]

    def _pyro_post_sample(self, msg):
        if type(msg["fn"]).__name__ == "_Subsample":
            return
        if self._suffix != self._suffixes[-1]:
            return
        # final pass: a site is a Markov variable iff its log-density
        # depends on some auxiliary variable's enumeration dim
        fn = msg["fn"]
        batch = tuple(getattr(fn, "batch_shape", ()))
        event_dim = getattr(fn, "event_dim", 0)
        val_shape = jnp.shape(msg["value"])
        if event_dim:
            val_shape = val_shape[: len(val_shape) - event_dim]
        lp_shape = broadcast_shape(batch, val_shape)
        for aux_name, infer in self._aux_infer.items():
            d = infer.get("_enumerate_dim")
            if d is not None and len(lp_shape) >= -d and lp_shape[d] > 1:
                self._markov_vars.add(self._aux_var[aux_name])


def vectorized_markov(name=None, size=None, dim=None, history=1):
    """Markov chain over a tensorized time dim; see
    ``VectorizedMarkovMessenger``.  Interchangeable with ``pyro.markov``
    under enumeration-based inference (``TraceEnum_ELBO``,
    ``infer_discrete``)."""
    return VectorizedMarkovMessenger(
        name=name, size=size, dim=dim, history=history
    )
