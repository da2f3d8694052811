"""User-facing modeling primitives.

Ref ``pyro/primitives.py``: ``sample:125``, ``param:57``, ``plate:283``,
``factor:195``, ``deterministic:221``, ``subsample:249``, ``module:429``,
validation switches ``:556-600``.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional, Union

import jax
import jax.numpy as jnp

from . import poutine
from .distributions import constraints as _constraints
from .distributions.delta import Delta, Unit
from .distributions.distribution import Distribution
from .params.param_store import get_param_store
from .poutine.plate_messenger import PlateMessenger, plate_stack
from .poutine.runtime import (
    _PYRO_STACK,
    am_i_wrapped,
    apply_stack,
    effectful,
    new_message,
)


def sample(
    name: str,
    fn,
    *args,
    obs=None,
    obs_mask=None,
    rng_key=None,
    infer: Optional[dict] = None,
    sample_shape=(),
    **kwargs,
):
    """Draw a (possibly observed) sample from ``fn`` at a named site.

    Ref ``primitives.py:125-192``.  When no handler is active this is a
    plain draw from ``fn`` (using an eager global key unless ``rng_key``
    is given).
    """
    if obs_mask is not None:
        return _masked_observe(
            name, fn, *args, obs=obs, obs_mask=obs_mask, rng_key=rng_key,
            infer=infer, **kwargs,
        )
    if not am_i_wrapped():
        if obs is not None:
            return obs
        if rng_key is None:
            from .poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        return fn(*args, rng_key=rng_key, sample_shape=sample_shape, **kwargs)
    kwargs["sample_shape"] = sample_shape
    msg = new_message(
        "sample", name, fn, args, kwargs, value=obs, infer=infer or {}
    )
    msg["is_observed"] = obs is not None
    msg["rng_key"] = rng_key
    msg = apply_stack(msg)
    return msg["value"]


def _masked_observe(name, fn, *args, obs, obs_mask, rng_key, infer, **kwargs):
    """Partially-observed site: split into observed/unobserved halves
    (ref ``primitives.py:94-122``)."""
    with poutine.mask(mask=obs_mask):
        observed = sample(
            f"{name}_observed", fn, *args, obs=obs, infer=infer, **kwargs
        )
    with poutine.mask(mask=_logical_not(obs_mask)):
        unobserved = sample(
            f"{name}_unobserved", fn, *args, rng_key=rng_key, infer=infer,
            **kwargs,
        )
    shape = jnp.shape(obs_mask) and obs_mask
    mask = obs_mask
    event_dim = fn.event_dim
    if event_dim:
        mask = jnp.reshape(mask, jnp.shape(mask) + (1,) * event_dim)
    value = jnp.where(mask, observed, unobserved)
    return deterministic(name, value, event_dim=event_dim)


def _logical_not(mask):
    if isinstance(mask, bool):
        return not mask
    return ~mask


def param(
    name: str,
    init_value=None,
    constraint=_constraints.real,
    event_dim: Optional[int] = None,
):
    """Register/fetch a learnable parameter (ref ``primitives.py:57``)."""
    store = get_param_store()
    if not am_i_wrapped():
        return store.get_param(name, init_value, constraint, event_dim)
    msg = new_message(
        "param",
        name,
        _param_fn,
        (name, init_value),
        {"constraint": constraint, "event_dim": event_dim},
    )
    msg = apply_stack(msg)
    return msg["value"]


def _param_fn(name, init_value, constraint=_constraints.real, event_dim=None):
    return get_param_store().get_param(name, init_value, constraint, event_dim)


def plate(
    name: str,
    size: Optional[int] = None,
    subsample_size: Optional[int] = None,
    subsample=None,
    dim: Optional[int] = None,
    use_cuda=None,
    device=None,
) -> PlateMessenger:
    """Vectorized conditional-independence context (ref ``primitives.py:283``)."""
    return PlateMessenger(
        name,
        size=size,
        subsample_size=subsample_size,
        subsample=subsample,
        dim=dim,
    )


def factor(name: str, log_factor, *, has_rsample: Optional[bool] = None):
    """Arbitrary log-probability factor (ref ``primitives.py:195``)."""
    unit_dist = Unit(log_factor, has_rsample=has_rsample)
    unit_value = jnp.zeros(unit_dist.shape())
    sample(name, unit_dist, obs=unit_value, infer={"is_auxiliary": True})


def deterministic(name: str, value, event_dim: Optional[int] = None):
    """Record a deterministic function of other sites
    (ref ``primitives.py:221``)."""
    event_dim = jnp.ndim(value) if event_dim is None else event_dim
    return sample(
        name,
        Delta(value, event_dim=event_dim),
        obs=value,
        infer={"_deterministic": True},
    )


def subsample(data, event_dim: int):
    """Plate-aware subsampling of a data tensor (ref ``primitives.py:249``)."""
    assert isinstance(event_dim, int) and event_dim >= 0
    if not am_i_wrapped():
        return data
    msg = new_message(
        "subsample", None, None, (), {"event_dim": event_dim}, value=data
    )
    msg["done"] = True
    msg = apply_stack(msg)
    return msg["value"]


def barrier(data):
    """No-op grounding barrier for funsor-style backends
    (ref ``primitives.py:546``)."""
    return data


def module(name: str, nn_module, update_module_params: bool = False):
    """Register a flax/haiku-style module's params in the store.

    Ref ``primitives.py:429`` registers ``torch.nn.Module`` params under
    ``{name}$$${param}``.  The JAX equivalent is in ``pyro_tpu.nn``: use
    ``pyro_tpu.nn.flax_module``/``random_flax_module``.  This shim exists
    for API parity and raises with a pointer.
    """
    raise NotImplementedError(
        "pyro_tpu.module: use pyro_tpu.nn.flax_module(name, module, ...) for "
        "JAX neural networks"
    )


# default tracks ``__debug__`` like the reference (``primitives.py:564``):
# validation on unless python runs with -O
_VALIDATION_ENABLED = __debug__


def enable_validation(is_validate: bool = True) -> None:
    """Ref ``primitives.py:556``."""
    global _VALIDATION_ENABLED
    _VALIDATION_ENABLED = is_validate
    from .distributions.util import enable_validation as dist_enable

    dist_enable(is_validate)


@contextmanager
def validation_enabled(is_validate: bool = True):
    old = _VALIDATION_ENABLED
    enable_validation(is_validate)
    try:
        yield
    finally:
        enable_validation(old)
