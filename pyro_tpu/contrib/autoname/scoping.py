"""Site-name scoping (ref ``pyro/contrib/autoname/scoping.py``)."""

from __future__ import annotations

import functools
from typing import Optional

from ...poutine.messenger import Messenger


class ScopeMessenger(Messenger):
    """Prefix all site names inside with ``prefix/`` (ref
    ``scoping.py:ScopeMessenger``)."""

    def __init__(self, prefix: Optional[str] = None, inner=None):
        super().__init__()
        self.prefix = prefix
        self.inner = inner

    def __call__(self, fn):
        if self.prefix is None:
            self.prefix = fn.__name__

        @functools.wraps(fn)
        def _fn(*args, **kwargs):
            with type(self)(prefix=self.prefix, inner=self.inner):
                return fn(*args, **kwargs)

        return _fn

    def _process_message(self, msg):
        if msg["type"] in ("sample", "param") and msg["name"] is not None:
            msg["name"] = f"{self.prefix}/{msg['name']}"


class NameCountMessenger(Messenger):
    """Append __0, __1 to duplicate site names (ref
    ``scoping.py:NameCountMessenger``)."""

    def __enter__(self):
        self._names = set()
        return super().__enter__()

    def _increment_name(self, name, label):
        while (name, label) in self._names:
            split = name.split("__")
            if len(split) > 1 and split[-1].isdigit():
                base = "__".join(split[:-1])
                name = f"{base}__{int(split[-1]) + 1}"
            else:
                name = f"{name}__0"
        return name

    def _process_message(self, msg):
        if msg["type"] in ("sample", "param") and msg["name"] is not None:
            msg["name"] = self._increment_name(msg["name"], msg["type"])

    def _postprocess_message(self, msg):
        if msg["type"] in ("sample", "param"):
            self._names.add((msg["name"], msg["type"]))


def scope(fn=None, prefix=None, inner=None):
    """Ref ``scoping.py:scope``."""
    msngr = ScopeMessenger(prefix=prefix, inner=inner)
    return msngr(fn) if fn is not None else msngr


def name_count(fn=None):
    """Ref ``scoping.py:name_count``."""
    msngr = NameCountMessenger()
    return msngr(fn) if fn is not None else msngr
