"""Distribution utilities (ref ``pyro/distributions/util.py``)."""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

_VALIDATION_ENABLED = False


def enable_validation(is_validate: bool = True) -> None:
    global _VALIDATION_ENABLED
    _VALIDATION_ENABLED = is_validate


def is_validation_enabled() -> bool:
    return _VALIDATION_ENABLED


import contextlib


@contextlib.contextmanager
def validation_enabled(is_validate: bool = True):
    """Context-managed validation flag (ref ``distributions/__init__.py``)."""
    old = is_validation_enabled()
    enable_validation(is_validate)
    try:
        yield
    finally:
        enable_validation(old)


def is_identically_zero(x) -> bool:
    """True if ``x`` is the literal number zero (ref ``util.py:61``)."""
    return isinstance(x, (int, float)) and x == 0


def is_identically_one(x) -> bool:
    """True if ``x`` is the literal number one (ref ``util.py:72``)."""
    return isinstance(x, (int, float)) and x == 1


def broadcast_shape(*shapes: Sequence[int], strict: bool = False) -> tuple:
    """Broadcast shapes, optionally in strict mode where a size-1 dim only
    broadcasts against size 1 (ref ``util.py:107-140``)."""
    reversed_shape: list = []
    for shape in shapes:
        for i, size in enumerate(reversed(shape)):
            if i >= len(reversed_shape):
                reversed_shape.append(size)
            elif reversed_shape[i] == 1 and not strict:
                reversed_shape[i] = size
            elif reversed_shape[i] != size and (size != 1 or strict):
                raise ValueError(
                    f"shape mismatch: objects cannot be broadcast to a "
                    f"single shape: {list(map(tuple, shapes))}"
                )
    return tuple(reversed(reversed_shape))


def sum_rightmost(value, dim):
    """Sum out the rightmost ``dim`` dimensions (ref ``util.py:253``).

    ``dim == 0`` is a no-op; ``float('inf')`` sums everything; negative
    ``dim`` keeps the leftmost ``-dim`` dimensions.
    """
    import numbers

    if isinstance(value, numbers.Number):
        return value
    ndim = jnp.ndim(value)
    if dim == float("inf"):
        return jnp.sum(value)
    if dim < 0:
        dim += ndim
    if dim == 0:
        return value
    if dim >= ndim:
        return jnp.sum(value)
    return jnp.sum(value, axis=tuple(range(-int(dim), 0)))


def sum_leftmost(value, dim):
    """Sum out the leftmost ``dim`` dimensions (ref ``util.py:279``)."""
    import numbers

    if isinstance(value, numbers.Number):
        return value
    ndim = jnp.ndim(value)
    if dim == float("inf"):
        return jnp.sum(value)
    if dim < 0:
        dim += ndim
    if dim == 0:
        return value
    if dim >= ndim:
        return jnp.sum(value)
    return jnp.sum(value, axis=tuple(range(0, int(dim))))


def scale_and_mask(tensor, scale=1.0, mask=None):
    """Scale and mask a log-prob tensor.

    Ref ``pyro/distributions/util.py:361`` ``scale_and_mask``: masked-out
    elements become exactly 0 (not nan/inf), preserving gradients elsewhere.
    """
    if is_identically_one(scale) and mask is None:
        return tensor
    if mask is None:
        return tensor * scale
    return jnp.where(mask, tensor * scale, 0.0)


def promote_shapes(*args, shape=()):
    """Left-pad arrays so they all share a common broadcastable rank."""
    if len(args) < 2 and not shape:
        return args
    shapes = [jnp.shape(arg) for arg in args]
    num_dims = len(broadcast_shape(shape, *shapes))
    return [
        jnp.reshape(arg, (1,) * (num_dims - len(s)) + tuple(s))
        if len(s) < num_dims
        else arg
        for arg, s in zip(args, shapes)
    ]


def clamp_probs(probs):
    eps = jnp.finfo(jnp.result_type(probs, jnp.float32)).eps
    return jnp.clip(probs, eps, 1.0 - eps)


def logits_to_probs(logits, is_binary=False):
    if is_binary:
        return jax.nn.sigmoid(logits)
    return jax.nn.softmax(logits, axis=-1)


def probs_to_logits(probs, is_binary=False):
    ps = clamp_probs(probs)
    if is_binary:
        return jnp.log(ps) - jnp.log1p(-ps)
    return jnp.log(ps)


def von_mises_centered(key, concentration, shape, dtype=jnp.float32):
    """Best-Fisher (1979) rejection sampler for centered von Mises, done with
    a fixed number of proposal rounds under ``lax.while_loop``."""
    s_cutoff = {jnp.float32: 1.8e-4, jnp.float64: 1.2e-9}.get(dtype, 1.8e-4)
    r = 1.0 + jnp.sqrt(1.0 + 4.0 * concentration**2)
    rho = (r - jnp.sqrt(2.0 * r)) / (2.0 * concentration)
    s_exact = (1.0 + rho**2) / (2.0 * rho)
    s_approximate = 1.0 / jnp.clip(concentration, min=1e-10)
    s = jnp.where(concentration > s_cutoff, s_exact, s_approximate)

    def cond(state):
        _, done, *_ = state
        return ~jnp.all(done)

    def body(state):
        k, done, u, w = state
        k, k1, k2, k3 = jax.random.split(k, 4)
        u1 = jax.random.uniform(k1, shape, dtype)
        u2 = jax.random.uniform(k2, shape, dtype)
        u3 = jax.random.uniform(k3, shape, dtype)
        z = jnp.cos(jnp.pi * u1)
        w_prop = (1.0 + s * z) / (s + z)
        y = concentration * (s - w_prop)
        accept = (y * (2.0 - y) >= u2) | (jnp.log(y / u2) + 1.0 >= y)
        sign = jnp.where(u3 < 0.5, -1.0, 1.0)
        w = jnp.where(done, w, jnp.where(accept, w_prop, w))
        u = jnp.where(done, u, jnp.where(accept, sign, u))
        return k, done | accept, u, w

    init = (
        key,
        jnp.zeros(shape, bool),
        jnp.zeros(shape, dtype),
        jnp.zeros(shape, dtype),
    )
    _, _, u, w = jax.lax.while_loop(cond, body, init)
    return u * jnp.arccos(jnp.clip(w, -1.0, 1.0))


def detach(x):
    return jax.lax.stop_gradient(x)


def lazy_property(fn):
    """Cached property (distributions are immutable once constructed).

    Values computed while tracing (jax Tracers) are NOT cached: a
    distribution built eagerly but first touched inside ``jit`` would
    otherwise capture a tracer and leak it into later calls."""
    attr = "_lazy_" + fn.__name__

    @property
    def _lazy(self):
        if hasattr(self, attr):
            return getattr(self, attr)
        value = fn(self)
        if not isinstance(value, jax.core.Tracer):
            object.__setattr__(self, attr, value)
        return value

    return _lazy
