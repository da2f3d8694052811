"""Global settings registry (ref ``pyro/settings.py``).

Example::

    import pyro_tpu.settings as settings
    settings.set(validate_distributions=True)
    with settings.context(validate_distributions=False):
        ...
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional, Tuple

# alias -> (module, deepname, validator)
_REGISTRY: Dict[str, Tuple[Any, str, Optional[Callable]]] = {}


def get(alias: Optional[str] = None):
    """Read one or all settings (ref ``settings.py:get``)."""
    if alias is None:
        return {a: get(a) for a in sorted(_REGISTRY)}
    module, deepname, _ = _REGISTRY[alias]
    value = module
    for part in deepname.split("."):
        value = getattr(value, part)
    return value


def set(**kwargs) -> None:
    """Set one or more registered settings (ref ``settings.py:set``)."""
    for alias, value in kwargs.items():
        module, deepname, validator = _REGISTRY[alias]
        if validator is not None:
            validator(value)
        destination = module
        parts = deepname.split(".")
        for part in parts[:-1]:
            destination = getattr(destination, part)
        setattr(destination, parts[-1], value)


@contextmanager
def context(**kwargs):
    """Temporarily set settings (ref ``settings.py:context``)."""
    old = {alias: get(alias) for alias in kwargs}
    try:
        set(**kwargs)
        yield
    finally:
        set(**old)


def register(
    alias: str,
    modulename: str,
    deepname: str,
    validator: Optional[Callable] = None,
):
    """Register a module attribute as a setting (ref
    ``settings.py:register``); usable as a validator decorator."""
    import importlib

    module = importlib.import_module(modulename)
    _REGISTRY[alias] = (module, deepname, validator)

    def decorator(fn):
        _REGISTRY[alias] = (module, deepname, fn)
        return fn

    return decorator


# built-in settings
register(
    "validate_distributions",
    "pyro_tpu.distributions.util",
    "_VALIDATION_ENABLED",
    lambda v: None if isinstance(v, bool) else (_ for _ in ()).throw(ValueError("expected bool")),
)
register(
    "binomial_approx_sample_thresh",
    "pyro_tpu.distributions.discrete",
    "Binomial.approx_sample_thresh",
)
register(
    # storage dtype for the time-varying enum factors streamed by the
    # vectorized-markov scan elimination (None = trace dtype; set to
    # jnp.bfloat16 to halve the scan's HBM traffic — arithmetic stays
    # f32).  TPU-specific; no reference analog.
    "enum_factor_dtype",
    "pyro_tpu.ops.markov_product",
    "FACTOR_DTYPE",
)
