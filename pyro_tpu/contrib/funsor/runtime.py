"""Name <-> dim bookkeeping for the funsor frontend.

Ref ``pyro/contrib/funsor/handlers/runtime.py:68-237`` (``DimStack``): a
single global bidirectional mapping between funsor input *names* and
negative positional *dims*, replacing the separate plate/enum allocators.
This native version keeps the same observable API — ``DimType`` (LOCAL /
GLOBAL / VISIBLE), ``DimRequest``, frame push/pop, and ``allocate`` which
satisfies a batch of name-or-dim requests by reusing existing bindings
and allocating fresh dims downward from ``first_available_dim`` — in a
leaner form: frames are flat dicts and the fresh-value search is a single
scan over the read environment.
"""

from __future__ import annotations

from collections import Counter, OrderedDict, namedtuple
from enum import Enum


class DimType(Enum):
    LOCAL = 0
    GLOBAL = 1
    VISIBLE = 2


DimRequest = namedtuple("DimRequest", ["value", "dim_type"])
DimRequest.__new__.__defaults__ = (None, DimType.LOCAL)


class StackFrame:
    """One bidirectional name <-> dim binding environment."""

    def __init__(self, history=1, keep=False):
        self.name_to_dim = OrderedDict()
        self.dim_to_name = OrderedDict()
        self.history = history
        self.keep = keep

    def bind(self, name, dim):
        self.name_to_dim[name] = dim
        self.dim_to_name[dim] = name

    def __contains__(self, key):
        side = self.dim_to_name if isinstance(key, int) else self.name_to_dim
        return key in side

    def __getitem__(self, key):
        side = self.dim_to_name if isinstance(key, int) else self.name_to_dim
        return side[key]


class DimStack:
    """Global name <-> dim allocator (one instance, ``_DIM_STACK``)."""

    MAX_DIM = -25
    DEFAULT_FIRST_DIM = -5

    def __init__(self):
        root = StackFrame(history=0)
        self._local = [root]
        self._iter = [root]
        self._global = [root]
        self._first_available_dim = self.DEFAULT_FIRST_DIM
        self.outermost = None

    def set_first_available_dim(self, dim):
        assert dim is None or (self.MAX_DIM < dim < 0)
        old, self._first_available_dim = self._first_available_dim, dim
        return old

    # frame plumbing -------------------------------------------------------
    def push_global(self, frame):
        self._global.append(frame)

    def pop_global(self):
        assert len(self._global) > 1, "cannot pop the root frame"
        return self._global.pop()

    def push_local(self, frame):
        self._local.append(frame)

    def pop_local(self):
        assert len(self._local) > 1, "cannot pop the root frame"
        return self._local.pop()

    def push_iter(self, frame):
        self._iter.append(frame)

    def pop_iter(self):
        assert len(self._iter) > 1, "cannot pop the root frame"
        return self._iter.pop()

    @property
    def global_frame(self):
        return self._global[-1]

    @property
    def local_frame(self):
        return self._local[-1]

    @property
    def current_write_env(self):
        f = self.local_frame
        return self._local[-1:] if not f.keep else self._local[-f.history - 1 :]

    @property
    def current_read_env(self):
        f = self.local_frame
        return self._global + self._local[-f.history - 1 :] + self._iter

    # allocation -----------------------------------------------------------
    def _fresh_dim(self, start):
        dim = start
        while any(dim in frame for frame in self.current_read_env):
            dim -= 1
        return dim

    def allocate(self, requests):
        """Satisfy an OrderedDict of {name_or_dim: DimRequest}.  Existing
        bindings are reused; fresh dims are allocated downward from
        ``first_available_dim`` (or from -1 for VISIBLE requests)."""
        resolved = OrderedDict()
        pending = OrderedDict()
        for key, req in requests.items():
            hit = None
            for frame in self.current_read_env:
                if req.value is None and key in frame:
                    hit = frame[key]
                    break
                if req.value is not None and req.value in frame:
                    hit = req.value
                    break
            if hit is None:
                pending[key] = req
            else:
                resolved[key] = hit
        if max(Counter(resolved.values()).values(), default=0) > 1:
            raise ValueError(f"{resolved} is not a valid shape request")

        for key, req in pending.items():
            if isinstance(key, int):
                dim = key
                name = req.value or f"_pyro_dim_{-key}"
            else:
                name = key
                if req.dim_type == DimType.VISIBLE:
                    dim = self._fresh_dim(-1 if req.value is None else req.value)
                    if dim <= (self._first_available_dim or self.DEFAULT_FIRST_DIM):
                        raise ValueError(f"ran out of visible dims for {name}")
                else:
                    dim = self._fresh_dim(
                        self._first_available_dim
                        if self._first_available_dim is not None
                        else self.DEFAULT_FIRST_DIM
                    )
                    if dim < self.MAX_DIM:
                        raise ValueError(f"ran out of free dims for {name}")
            targets = (
                [self.global_frame]
                if req.dim_type != DimType.LOCAL
                else self.current_write_env
            )
            for frame in targets:
                frame.bind(name, dim)
            resolved[key] = dim if isinstance(key, str) else name
        return resolved

    def allocate_dim_to_name(self, dim_to_request):
        return self.allocate(dim_to_request)

    def names_from_batch_shape(self, batch_shape, dim_type=DimType.LOCAL):
        return self.allocate(
            OrderedDict(
                (dim, DimRequest(None, dim_type))
                for dim in range(-len(batch_shape), 0)
                if batch_shape[dim] > 1
            )
        )


_DIM_STACK = DimStack()
