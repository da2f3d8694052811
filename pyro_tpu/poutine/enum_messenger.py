"""Parallel enumeration of discrete sites.

Ref ``pyro/poutine/enum_messenger.py`` (``enumerate_site:114``,
``EnumMessenger:136``) and ``markov_messenger.py``.

Enumeration happens at trace time with deterministic dim allocation, so
shapes are static per model structure and the whole enumerated computation
compiles under ``jit`` (SURVEY hard part #1: no runtime dynamism is
actually needed because the allocator's decisions depend only on site
order, not values).
"""

from __future__ import annotations

from collections import Counter
from contextlib import ExitStack
from typing import Dict, Iterable, List, Optional, Set

import jax.numpy as jnp

from .messenger import Messenger
from .runtime import _ENUM_ALLOCATOR


def _tmc_sample(msg, key) -> jnp.ndarray:
    """TMC multi-sample 'enumeration' with ancestor thinning (ref
    ``poutine/enum_messenger.py:17`` ``_tmc_mixture_sample`` and ``:67``
    ``_tmc_diagonal_sample``).

    A fat sample ``(K,) + batch_shape`` would make each particle depend on
    every upstream particle combination — K^depth joint materialization on
    chains.  The reference thins each non-plate batch dim of size > 1
    (an upstream site's particle dim) down to one ancestor per particle:
    ``diagonal`` identifies particle k with ancestor k; ``mixture`` draws
    the ancestor uniformly at random per particle.
    """
    import jax

    dist = msg["fn"]
    num_samples = msg["infer"]["num_samples"]
    strategy = msg["infer"].get("tmc", "diagonal")
    if strategy not in ("diagonal", "mixture"):
        raise ValueError(f"{strategy} not a valid TMC strategy")

    # plate dims keep their extent; all other batch dims get thinned to 1
    batch_shape = [1] * len(dist.batch_shape)
    for f in msg["cond_indep_stack"]:
        if f.dim is not None:
            batch_shape[f.dim] = (
                f.size if f.size > 0 else dist.batch_shape[f.dim]
            )
    key, sub = jax.random.split(key)
    fat = dist.sample(sub, (num_samples,))
    event_ndim = len(dist.event_shape)
    target_shape = (num_samples,) + tuple(batch_shape) + tuple(
        dist.event_shape
    )
    if fat.shape == target_shape:
        return fat

    thin = fat
    n_batch = len(dist.batch_shape)
    for i in range(n_batch):
        axis = 1 + i  # position in fat (after the leading particle dim)
        size = thin.shape[axis]
        if size <= 1 or batch_shape[i] != 1:
            continue
        if strategy == "diagonal":
            # particle k takes ancestor k (sizes match when every site
            # uses the same num_samples; % guards ragged settings)
            ancestor = jnp.arange(num_samples) % size
        else:
            key, sub = jax.random.split(key)
            ancestor = jax.random.randint(
                sub, (num_samples,), 0, size
            )
        idx = ancestor.reshape((num_samples,) + (1,) * (thin.ndim - 1))
        thin = jnp.take_along_axis(
            thin, jnp.broadcast_to(
                idx,
                thin.shape[:axis] + (1,) + thin.shape[axis + 1:],
            ), axis=axis,
        )
    assert thin.shape == target_shape, (thin.shape, target_shape)
    return thin


def enumerate_site(msg) -> jnp.ndarray:
    """Ref ``enum_messenger.py:114``: value over the site's support with
    the cardinality in a fresh leftmost dim."""
    dist = msg["fn"]
    num_samples = msg["infer"].get("num_samples")
    if num_samples is None:
        value = dist.enumerate_support(
            expand=msg["infer"].get("expand", False)
        )
    elif num_samples > 1:
        # TMC-style multi-sample enumeration (ref ``infer/enum.py:17``)
        key = msg["rng_key"]
        if key is None:
            from .runtime import _next_eager_key

            key = _next_eager_key()
        value = _tmc_sample(msg, key)
    else:
        raise ValueError("invalid num_samples")
    assert jnp.ndim(value) == 1 + len(dist.batch_shape) + len(
        dist.event_shape
    )
    return value


class EnumMessenger(Messenger):
    """Ref ``enum_messenger.py:136``."""

    def __init__(self, first_available_dim: Optional[int] = None):
        assert first_available_dim is None or first_available_dim < 0
        self.first_available_dim = first_available_dim
        super().__init__()

    def __enter__(self):
        if self.first_available_dim is not None:
            _ENUM_ALLOCATOR.set_first_available_dim(self.first_available_dim)
        self._markov_depths: Dict[str, int] = {}
        self._param_dims: Dict[str, Dict[int, int]] = {}
        self._value_dims: Dict[str, Dict[int, int]] = {}
        return super().__enter__()

    def _pyro_sample(self, msg) -> None:
        from ..distributions.distribution import Distribution

        if msg["done"] or not isinstance(msg["fn"], Distribution):
            return

        # upstream dims in scope are unsafe for this site's target dim
        scope = msg["infer"].get("_markov_scope")
        param_dims = dict(_ENUM_ALLOCATOR.dim_to_id)
        if scope is not None:
            for name, depth in scope.items():
                if self._markov_depths.get(name) == depth:
                    param_dims.update(self._value_dims.get(name, {}))
            self._markov_depths[msg["name"]] = msg["infer"]["_markov_depth"]
        self._param_dims[msg["name"]] = param_dims
        if msg["is_observed"] or msg["infer"].get("enumerate") != "parallel":
            return

        value = enumerate_site(msg)
        actual_dim = -1 - len(msg["fn"].batch_shape)

        target_dim, id_ = _ENUM_ALLOCATOR.allocate(
            None if scope is None else set(param_dims)
        )
        event_dim = msg["fn"].event_dim
        if actual_dim < target_dim:
            # move the enumeration axis rightward to target_dim
            assert value.shape[target_dim - event_dim] == 1, (
                f"pyro.markov dim conflict at dim {actual_dim}"
            )
            value = jnp.swapaxes(
                value, target_dim - event_dim, actual_dim - event_dim
            )
            while value.ndim and value.shape[0] == 1:
                value = value[0]
        elif target_dim < actual_dim:
            diff = actual_dim - target_dim
            value = jnp.reshape(
                value, value.shape[:1] + (1,) * diff + value.shape[1:]
            )

        value_dims = {
            dim: param_dims[dim]
            for dim in range(event_dim - value.ndim, 0)
            if value.shape[dim - event_dim] > 1 and dim in param_dims
        }
        value_dims[target_dim] = id_

        msg["infer"]["_enumerate_dim"] = target_dim
        msg["infer"]["_dim_to_id"] = value_dims
        msg["value"] = value
        msg["done"] = True

    def _pyro_post_sample(self, msg) -> None:
        from ..distributions.distribution import Distribution

        if not isinstance(msg["fn"], Distribution):
            return
        value = msg["value"]
        if value is None:
            return
        shape = jnp.shape(value)[
            : jnp.ndim(value) - msg["fn"].event_dim
        ]
        dim_to_id = msg["infer"].setdefault("_dim_to_id", {})
        dim_to_id.update(self._param_dims.get(msg["name"], {}))
        self._value_dims[msg["name"]] = {
            dim: id_
            for dim, id_ in dim_to_id.items()
            if len(shape) >= -dim and shape[dim] > 1
        }


class ReentrantMessenger(Messenger):
    """Ref ``reentrant_messenger.py``: allows ``with self: ... with self:``."""

    def __init__(self):
        self._ref_count = 0
        super().__init__()

    def __call__(self, fn):
        import functools

        return functools.wraps(fn)(super().__call__(fn))

    def __enter__(self):
        self._ref_count += 1
        if self._ref_count == 1:
            super().__enter__()
        return self

    def __exit__(self, *args, **kwargs):
        self._ref_count -= 1
        if self._ref_count == 0:
            super().__exit__(*args, **kwargs)


class MarkovMessenger(ReentrantMessenger):
    """Markov dependency declaration with dim recycling
    (ref ``markov_messenger.py:16``)."""

    def __init__(self, history: int = 1, keep: bool = False, dim=None, name=None):
        assert history >= 0
        self.history = history
        self.keep = keep
        if dim is not None or name is not None:
            raise NotImplementedError(
                "vectorized markov not yet implemented; use history/keep"
            )
        self._iterable: Optional[Iterable] = None
        self._pos = -1
        self._stack: List[Set[str]] = []
        super().__init__()

    def generator(self, iterable):
        self._iterable = iterable
        return self

    def __iter__(self):
        with ExitStack() as stack:
            assert self._iterable is not None
            for value in self._iterable:
                stack.enter_context(self)
                yield value

    def __enter__(self):
        self._pos += 1
        if len(self._stack) <= self._pos:
            self._stack.append(set())
        return super().__enter__()

    def __exit__(self, *args, **kwargs):
        if not self.keep:
            self._stack.pop()
        self._pos -= 1
        return super().__exit__(*args, **kwargs)

    def _pyro_sample(self, msg) -> None:
        if msg["done"] or type(msg["fn"]).__name__ == "_Subsample":
            return
        infer = msg["infer"]
        scope = infer.setdefault("_markov_scope", Counter())
        for pos in range(max(0, self._pos - self.history), self._pos + 1):
            scope.update(self._stack[pos])
        infer["_markov_depth"] = 1 + infer.get("_markov_depth", 0)
        self._stack[self._pos].add(msg["name"])


def markov(fn=None, history: int = 1, keep: bool = False, dim=None, name=None):
    """Markov context/iterator/decorator (ref ``pyro.markov``)."""
    if fn is None:
        return MarkovMessenger(history=history, keep=keep, dim=dim, name=name)
    if callable(fn) and not hasattr(fn, "__iter__"):
        return MarkovMessenger(history=history, keep=keep)(fn)
    # iterable: return a generator context
    return MarkovMessenger(history=history, keep=keep, dim=dim, name=name).generator(fn)
