"""Messenger base class (ref ``pyro/poutine/messenger.py:73``).

A ``Messenger`` is a context manager that installs itself on the global
handler stack.  While active, every effectful primitive routes its message
through ``_process_message`` (stack top → bottom) and
``_postprocess_message`` (bottom → top).  Subclasses implement per-type
hooks ``_pyro_<type>`` / ``_pyro_post_<type>``; dispatch happens here.

Used as a decorator, a Messenger wraps a callable so the handler is entered
around every call (dual-use API, ref ``messenger.py:96-126``).
"""

from __future__ import annotations

import functools
from contextlib import contextmanager
from typing import Any, Callable, Dict, List, Optional

from .runtime import _PYRO_STACK


class Messenger:
    def __call__(self, fn: Callable) -> Callable:
        if not callable(fn):
            raise ValueError(f"{fn} is not callable")

        @functools.wraps(fn)
        def _context_wrap(*args, **kwargs):
            with self:
                return fn(*args, **kwargs)

        _context_wrap.msngr = self  # type: ignore[attr-defined]
        return _context_wrap

    def __enter__(self) -> "Messenger":
        if self in _PYRO_STACK:
            raise ValueError("cannot re-enter an active Messenger")
        _PYRO_STACK.append(self)
        return self

    def __exit__(self, exc_type, exc_value, traceback) -> None:
        # Exception-safe unwinding (ref `messenger.py:128-176`): on clean
        # exit we must be at the top of the stack; on exception, unwind
        # everything above us too.
        if exc_type is None:
            if _PYRO_STACK[-1] is not self:
                raise ValueError("inconsistent handler stack on exit")
            _PYRO_STACK.pop()
        else:
            if self in _PYRO_STACK:
                loc = _PYRO_STACK.index(self)
                for i in range(loc, len(_PYRO_STACK)):
                    _PYRO_STACK.pop()

    def _reset(self) -> None:
        pass

    def _process_message(self, msg: Dict[str, Any]) -> None:
        method = getattr(self, "_pyro_{}".format(msg["type"]), None)
        if method is not None:
            method(msg)

    def _postprocess_message(self, msg: Dict[str, Any]) -> None:
        method = getattr(self, "_pyro_post_{}".format(msg["type"]), None)
        if method is not None:
            method(msg)

    @classmethod
    def register(cls, fn: Optional[Callable] = None, type: Optional[str] = None):
        if fn is None:
            return lambda f: cls.register(f, type=type)
        assert type is not None
        setattr(cls, "_pyro_" + type, staticmethod(fn))
        return fn


@contextmanager
def block_messengers(predicate: Callable[[Messenger], bool]):
    """Temporarily remove matching messengers from the stack.

    Ref ``messenger.py:263-287``.
    """
    blocked: List[tuple] = []
    for i, m in reversed(list(enumerate(_PYRO_STACK))):
        if predicate(m):
            blocked.append((i, m))
            _PYRO_STACK.pop(i)
    try:
        yield tuple(m for _, m in reversed(blocked))
    finally:
        for i, m in reversed(blocked):
            _PYRO_STACK.insert(i, m)
