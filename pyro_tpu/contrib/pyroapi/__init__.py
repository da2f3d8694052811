"""Generic-backend dispatch, modeled on the ``pyro-api`` package.

Ref usage: ``/root/reference/tests/pyroapi/test_pyroapi.py`` runs a
backend-agnostic test suite via ``from pyroapi import pyro_backend`` and
generic module handles.  The external ``pyroapi`` package is a tiny
registry of module maps plus lazy proxy modules; this is a native
re-implementation of that machinery so backend-generic code (and the
vendored conformance suite in ``tests/pyroapi_vendor/``) runs without
the dependency.

Usage::

    from pyro_tpu.contrib.pyroapi import pyro_backend, pyro, distributions
    with pyro_backend("minipyro"):
        x = pyro.sample("x", distributions.Normal(0., 1.))

Backends registered by default: ``"pyro"`` (alias ``"pyro_tpu"``) — the
full framework — and ``"minipyro"`` (the didactic backend, with
distributions/optim borrowed from the main framework exactly as the
reference's minipyro registration borrows from torch/pyro).  Register
your own with :func:`register_backend`.
"""

from __future__ import annotations

import importlib
import threading
from contextlib import contextmanager

_BACKENDS = {}
_GENERIC_MODULES = ("pyro", "distributions", "handlers", "infer", "optim", "ops")
_local = threading.local()


def register_backend(alias: str, module_map: dict) -> None:
    """Register ``alias`` -> mapping of generic module name to module
    path (e.g. ``{"pyro": "pyro_tpu", "infer": "pyro_tpu.infer"}``)."""
    _BACKENDS[alias] = dict(module_map)


def _current_map():
    stack = getattr(_local, "stack", None)
    if not stack:
        return _BACKENDS["pyro"]
    return stack[-1]


class _GenericModule:
    """Lazy proxy forwarding attribute access to the active backend's
    module for one generic name."""

    def __init__(self, name: str):
        self._generic_name = name

    def _resolve(self):
        module_map = _current_map()
        path = module_map.get(self._generic_name)
        if path is None:
            raise NotImplementedError(
                f"backend does not provide generic module "
                f"'{self._generic_name}'"
            )
        return importlib.import_module(path)

    def __getattr__(self, attr):
        try:
            return getattr(self._resolve(), attr)
        except AttributeError as e:
            # pyroapi semantics: missing capability surfaces as
            # NotImplementedError so conformance suites can xfail it
            raise NotImplementedError(str(e)) from e


@contextmanager
def pyro_backend(alias_or_map=None, **module_map):
    """Activate a backend by alias or explicit module map."""
    if alias_or_map is not None:
        if isinstance(alias_or_map, str):
            if alias_or_map not in _BACKENDS:
                raise KeyError(f"unknown backend: {alias_or_map}")
            module_map = _BACKENDS[alias_or_map]
        else:
            module_map = dict(alias_or_map)
    stack = getattr(_local, "stack", None)
    if stack is None:
        stack = _local.stack = []
    stack.append(module_map)
    try:
        yield
    finally:
        stack.pop()


pyro = _GenericModule("pyro")
distributions = _GenericModule("distributions")
handlers = _GenericModule("handlers")
infer = _GenericModule("infer")
optim = _GenericModule("optim")
ops = _GenericModule("ops")


register_backend(
    "pyro",
    {
        "pyro": "pyro_tpu",
        "distributions": "pyro_tpu.distributions",
        "handlers": "pyro_tpu.poutine",
        "infer": "pyro_tpu.infer",
        "optim": "pyro_tpu.optim",
        "ops": "pyro_tpu.ops",
    },
)
register_backend("pyro_tpu", dict(_BACKENDS["pyro"]))
register_backend(
    "minipyro",
    {
        # minipyro provides its own primitives/handlers/SVI; it borrows
        # distributions from the main framework (the reference's
        # minipyro registration likewise borrows pyro.distributions)
        "pyro": "pyro_tpu.contrib.minipyro",
        "distributions": "pyro_tpu.distributions",
        "handlers": "pyro_tpu.contrib.minipyro",
        "infer": "pyro_tpu.contrib.minipyro",
        "optim": "pyro_tpu.contrib.minipyro",
    },
)

__all__ = [
    "pyro_backend",
    "register_backend",
    "pyro",
    "distributions",
    "handlers",
    "infer",
    "optim",
    "ops",
]
