"""Effect-handler runtime for the TPU-native PPL.

Design notes (vs. reference ``pyro/poutine/runtime.py:39,108,351``):

The reference maintains a thread-global ``_PYRO_STACK`` of messenger objects and
routes every primitive statement through it as a mutable ``Message`` dict.  On
JAX the same *trace-time* architecture is sound — handlers manipulate messages
while Python executes the model, which is exactly when ``jax.jit`` traces it —
provided three invariants hold, which this implementation enforces:

1. **No value-dependent control flow in handlers.**  Handlers only inspect
   static metadata (names, shapes, dtypes); array values flow through opaquely
   as tracers.
2. **Explicit RNG.**  Sampling consumes a ``jax.random`` key carried in
   ``msg["rng_key"]`` and supplied by a ``seed`` handler that deterministically
   folds the site name into its key, so replay / vmap / multi-chip sharding are
   reproducible.  (The reference relies on torch's global RNG.)
3. **Handler state is rebuilt per trace.**  Messengers never cache tracers
   across traces; a jitted inference step re-executes the model function and
   therefore re-runs the handler stack from scratch.

The message protocol itself mirrors the reference so that the documented
semantics (process down the stack, default behavior, postprocess up the stack,
``stop`` short-circuit) carry over: see ``poutine/runtime.py:351-390``.
"""

from __future__ import annotations

import functools
from collections import namedtuple
from typing import Any, Callable, Dict, List, Optional

import jax

# The global effect-handler stack.  Append on __enter__, pop on __exit__.
_PYRO_STACK: List[Any] = []

# Fallback eager RNG key used by `pyro.sample` when no `seed` handler is
# active (convenience parity with the reference's use of torch's global RNG;
# reference `pyro/util.py:37` `set_rng_seed`).  Inference algorithms never
# rely on this: they install explicit seed handlers.
_EAGER_RNG_KEY: Optional[jax.Array] = None


def set_rng_seed(seed: int) -> None:
    """Set the global eager-mode RNG seed (ref ``pyro/util.py:37``)."""
    global _EAGER_RNG_KEY
    _EAGER_RNG_KEY = jax.random.key(seed)


def _next_eager_key() -> jax.Array:
    global _EAGER_RNG_KEY
    if _EAGER_RNG_KEY is None:
        _EAGER_RNG_KEY = jax.random.key(0)
    _EAGER_RNG_KEY, sub = jax.random.split(_EAGER_RNG_KEY)
    return sub


# A conditional-independence frame pushed onto msg["cond_indep_stack"] by
# `plate` (ref `poutine/indep_messenger.py:107` CondIndepStackFrame).
# dim counts from the right (negative); size is the full plate size;
# subsample_size == size when not subsampling.
CondIndepStackFrame = namedtuple(
    "CondIndepStackFrame", ["name", "dim", "size", "subsample_size"]
)


def default_site_key(name: str, base: jax.Array) -> jax.Array:
    """Derive a per-site key deterministically from a base key and site name."""
    # Stable 32-bit hash of the name (Python's hash() is salted per process).
    h = 2166136261
    for ch in name.encode():
        h = ((h ^ ch) * 16777619) & 0xFFFFFFFF
    return jax.random.fold_in(base, h)


class _DimAllocator:
    """Dim allocator for plates, dims counted from the right.

    Ref ``poutine/runtime.py:184-244``: plates nest with unique negative
    dims; explicit ``dim=`` requests are honored and collisions raise.
    """

    def __init__(self) -> None:
        self._stack: List[Optional[str]] = []  # index 0 == dim -1

    def allocate(self, name: str, dim: Optional[int]) -> int:
        if name in self._stack:
            raise ValueError(f"duplicate plate '{name}'")
        if dim is not None:
            if dim >= 0:
                raise ValueError(f"plate dim must be negative, got {dim}")
            while len(self._stack) < -dim:
                self._stack.append(None)
            if self._stack[-1 - dim] is not None:
                raise ValueError(
                    f"dim {dim} requested by plate '{name}' already claimed "
                    f"by plate '{self._stack[-1 - dim]}'"
                )
            self._stack[-1 - dim] = name
            return dim
        # find first free slot from the right
        for i, occupant in enumerate(self._stack):
            if occupant is None:
                self._stack[i] = name
                return -1 - i
        self._stack.append(name)
        return -len(self._stack)

    def free(self, name: str, dim: int) -> None:
        i = -1 - dim
        if i < len(self._stack) and self._stack[i] == name:
            self._stack[i] = None
        while self._stack and self._stack[-1] is None:
            self._stack.pop()


_DIM_ALLOCATOR = _DimAllocator()


class _EnumAllocator:
    """Enum-dim allocator: dims to the left of all plate dims.

    Ref ``poutine/runtime.py:246-299``.  ``set_first_available_dim`` is called
    by enumeration-aware algorithms with ``-1 - max_plate_nesting``.
    """

    def __init__(self) -> None:
        self.next_available_dim: Optional[int] = None
        self.next_available_id = 0
        self.dim_to_id: Dict[int, int] = {}

    def set_first_available_dim(self, first_available_dim: int) -> None:
        assert first_available_dim < 0
        self.next_available_dim = first_available_dim
        self.next_available_id = 0
        self.dim_to_id.clear()

    def allocate(self, scope_dims=None):
        if self.next_available_dim is None:
            raise ValueError(
                "enumeration requires an enclosing enum handler: call "
                "enum(model, first_available_dim=...) or use TraceEnum_ELBO"
            )
        dim = self.next_available_dim
        id_ = self.next_available_id
        self.next_available_id += 1
        if scope_dims is None:
            # global dim: never recycled; recorded in dim_to_id
            self.next_available_dim -= 1
            self.dim_to_id[dim] = id_
        else:
            # local dim: recyclable by sites whose scope excludes this one
            while dim in scope_dims:
                dim -= 1
        return dim, id_


_ENUM_ALLOCATOR = _EnumAllocator()


class NonlocalExit(Exception):
    """Raised by EscapeMessenger to stop model execution at a site.

    Ref ``poutine/runtime.py:306-333``.
    """

    def __init__(self, site: Dict[str, Any], *args, **kwargs) -> None:
        super().__init__(*args, **kwargs)
        self.site = site

    def reset_stack(self) -> None:
        """Reset the state of the frames remaining in the stack (ref
        ``runtime.py:321-331``): exception unwinding already popped the
        handlers between the raise site and the catch site, so only
        *reset* what remains — popping here would corrupt outer handlers
        (e.g. the trace handler driving a queue/pqueue re-execution
        loop)."""
        for frame in reversed(_PYRO_STACK):
            frame._reset()
            if getattr(frame, "_is_block", False) and frame.hide_fn(
                self.site
            ):
                break


def new_message(
    type: str,
    name: Optional[str],
    fn: Optional[Callable],
    args: tuple,
    kwargs: dict,
    value: Any = None,
    **extra: Any,
) -> Dict[str, Any]:
    """Construct a fresh message dict (ref ``poutine/runtime.py:108``)."""
    msg: Dict[str, Any] = {
        "type": type,
        "name": name,
        "fn": fn,
        "args": args,
        "kwargs": kwargs,
        "value": value,
        "is_observed": False,
        "scale": 1.0,
        "mask": None,
        "cond_indep_stack": (),
        "infer": {},
        "done": False,
        "stop": False,
        "continuation": None,
        "rng_key": None,
    }
    msg.update(extra)
    return msg


def default_process_message(msg: Dict[str, Any]) -> None:
    """Default behavior once all handlers have processed the message downward.

    Ref ``poutine/runtime.py:334-348``.  This is where RNG sampling actually
    happens for unobserved sample sites.
    """
    if msg["done"] or msg["is_observed"] or msg["value"] is not None:
        msg["done"] = True
        return
    if msg["type"] == "sample":
        key = msg["rng_key"]
        if key is None:
            key = _next_eager_key()
        sample_shape = msg["kwargs"].get("sample_shape", ())
        msg["value"] = msg["fn"](
            *msg["args"], rng_key=key, sample_shape=sample_shape
        )
    else:
        msg["value"] = msg["fn"](*msg["args"], **msg["kwargs"])
    msg["done"] = True


def apply_stack(initial_msg: Dict[str, Any]) -> Dict[str, Any]:
    """Send a message down then back up the handler stack.

    Ref ``poutine/runtime.py:351-390``: innermost (most recently entered)
    handler processes first going down; ``stop`` short-circuits; postprocess
    runs in reverse over exactly the handlers that processed.
    """
    stack = _PYRO_STACK
    msg = initial_msg

    pointer = 0
    for frame in reversed(stack):
        pointer += 1
        frame._process_message(msg)
        if msg["stop"]:
            break

    default_process_message(msg)

    for frame in stack[-pointer:]:
        frame._postprocess_message(msg)

    cont = msg["continuation"]
    if cont is not None:
        cont(msg)
    return msg


def am_i_wrapped() -> bool:
    """True if any effect handler is active (ref ``runtime.py:395``)."""
    return len(_PYRO_STACK) > 0


def effectful(fn: Optional[Callable] = None, type: Optional[str] = None):
    """Wrap a function so calls become effectful messages.

    Ref ``poutine/runtime.py:413-470``.
    """
    if fn is None:
        return functools.partial(effectful, type=type)
    if getattr(fn, "_is_effectful", False):
        return fn
    assert type is not None and type != "message"

    @functools.wraps(fn)
    def _fn(*args, name=None, infer=None, obs=None, **kwargs):
        if not am_i_wrapped():
            return fn(*args, **kwargs)
        msg = new_message(
            type, name, fn, args, kwargs, value=obs, infer=infer or {}
        )
        if obs is not None:
            msg["is_observed"] = True
        msg = apply_stack(msg)
        return msg["value"]

    _fn._is_effectful = True  # type: ignore[attr-defined]
    return _fn


def get_mask() -> Optional[Any]:
    """Current mask from enclosing mask/scale handlers (ref ``runtime.py:500``)."""
    if not am_i_wrapped():
        return None
    msg = new_message("inspect", "_pyro_get_mask", None, (), {}, value=True)
    msg["done"] = True
    msg["stop"] = False
    for frame in reversed(_PYRO_STACK):
        frame._process_message(msg)
    return msg["mask"]


def get_plates() -> tuple:
    """Current plate frames (ref ``runtime.py:520``)."""
    if not am_i_wrapped():
        return ()
    msg = new_message("inspect", "_pyro_get_plates", None, (), {}, value=True)
    msg["done"] = True
    for frame in reversed(_PYRO_STACK):
        frame._process_message(msg)
    return msg["cond_indep_stack"]
