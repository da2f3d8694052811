"""PyroModule: objects whose attributes are Pyro-managed
(ref ``pyro/nn/module.py``: ``PyroParam:79``, ``PyroSample:155``,
``PyroModule:339``, ``pyro_method:826``).

An attribute set to :class:`PyroParam` reads as ``pyro.param`` (store-
backed, constrained); one set to :class:`PyroSample` reads as
``pyro.sample`` against its prior, cached per execution context so one
model run draws each attribute once.  Unlike the reference there is no
``torch.nn.Module`` underneath — state lives in the global param store
(functional, jit-compatible), and submodules simply prefix names.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

from ..distributions import constraints as _constraints
from .. import primitives as pyro


class PyroParam(NamedTuple):
    """Ref ``nn/module.py:79``."""

    init_value: Any = None
    constraint: Any = _constraints.real
    event_dim: Optional[int] = None


class PyroSample(NamedTuple):
    """Ref ``nn/module.py:155``."""

    prior: Union[Any, Callable]


class _Context:
    """Per-execution sample cache (ref ``nn/module.py:250``): entered by
    ``pyro_method``/``__call__`` so repeated attribute reads within one
    model run return the same drawn value."""

    def __init__(self):
        self.active = 0
        self.cache = {}

    def __enter__(self):
        self.active += 1
        return self

    def __exit__(self, *exc):
        self.active -= 1
        if not self.active:
            self.cache.clear()

    def get(self, name):
        return self.cache.get(name) if self.active else None

    def set(self, name, value):
        if self.active:
            self.cache[name] = value


def _make_name(prefix: str, name: str) -> str:
    return f"{prefix}.{name}" if prefix else name


class PyroModule:
    """Ref ``nn/module.py:339``."""

    def __init__(self, name: str = ""):
        object.__setattr__(self, "_pyro_name", name)
        object.__setattr__(self, "_pyro_params", {})
        object.__setattr__(self, "_pyro_samples", {})
        object.__setattr__(self, "_pyro_context", _Context())

    @property
    def _pyro_prefix(self):
        # Reference semantics (ref ``nn/module.py:448-452``): an unnamed
        # root module contributes NO prefix — a root attribute ``y`` is the
        # param site ``"y"``, a nested one ``"p.w"``.
        return self._pyro_name

    def _pyro_set_supermodule(self, name: str, context: "_Context"):
        object.__setattr__(self, "_pyro_name", name)
        object.__setattr__(self, "_pyro_context", context)
        for key, value in self.__dict__.items():
            if isinstance(value, PyroModule):
                value._pyro_set_supermodule(
                    _make_name(name, key), context
                )

    def __setattr__(self, name: str, value: Any) -> None:
        if isinstance(value, PyroParam):
            # re-declaring a param forgets any previously registered value
            # (module-local semantics, ref ``test_module_cache``)
            if name in self._pyro_params:
                self._pyro_forget_param(name)
            self._pyro_params[name] = value
            self.__dict__.pop(name, None)
            return
        if isinstance(value, PyroSample):
            self._pyro_samples[name] = value
            self.__dict__.pop(name, None)
            return
        if name in self.__dict__.get("_pyro_params", {}):
            # assigning a raw value to an existing PyroParam attribute sets
            # the CONSTRAINED value through the store (ref ``nn/module.py``
            # ``__setattr__`` torch-Parameter update path)
            from ..params.param_store import get_param_store

            getattr(self, name)  # ensure registered
            get_param_store()[_make_name(self._pyro_prefix, name)] = value
            return
        if isinstance(value, PyroModule):
            old = self.__dict__.get(name)
            if isinstance(old, PyroModule) and old is not value:
                # replacing a submodule drops its registered store state so
                # the new module's inits take effect (the reference gets
                # this for free from module-local nn.Parameters)
                old._pyro_forget_all()
            value._pyro_set_supermodule(
                _make_name(self._pyro_prefix, name), self._pyro_context
            )
        object.__setattr__(self, name, value)

    def _pyro_forget_param(self, name: str) -> None:
        from ..params.param_store import get_param_store

        store = get_param_store()
        full = _make_name(self._pyro_prefix, name)
        if full in store:
            del store[full]

    def _pyro_forget_all(self) -> None:
        for name in self._pyro_params:
            self._pyro_forget_param(name)
        for value in self.__dict__.values():
            if isinstance(value, PyroModule):
                value._pyro_forget_all()

    def __getattr__(self, name: str) -> Any:
        # only called when normal lookup fails
        params = self.__dict__.get("_pyro_params", {})
        samples = self.__dict__.get("_pyro_samples", {})
        if name in params:
            p = params[name]
            init = p.init_value
            if callable(init):
                init = init()
            full = _make_name(self._pyro_prefix, name)
            return pyro.param(full, init, constraint=p.constraint)
        if name in samples:
            full = _make_name(self._pyro_prefix, name)
            ctx = self.__dict__["_pyro_context"]
            cached = ctx.get(full)
            if cached is not None:
                return cached
            prior = samples[name].prior
            if callable(prior) and not hasattr(prior, "sample"):
                prior = prior(self)
            value = pyro.sample(full, prior)
            ctx.set(full, value)
            return value
        if name.endswith("_unconstrained") and name[: -len("_unconstrained")] in params:
            # unconstrained view (ref exposes ``x_unconstrained`` leaves)
            from ..params.param_store import get_param_store

            base = name[: -len("_unconstrained")]
            getattr(self, base)  # ensure registered
            store = get_param_store()
            return store.get_all_unconstrained()[
                _make_name(self._pyro_prefix, base)
            ]
        raise AttributeError(
            f"{type(self).__name__!r} object has no attribute {name!r}"
        )

    def __delattr__(self, name: str) -> None:
        if name in self._pyro_params:
            self._pyro_forget_param(name)
            del self._pyro_params[name]
        elif name in self._pyro_samples:
            del self._pyro_samples[name]
        else:
            value = self.__dict__.get(name)
            if isinstance(value, PyroModule):
                value._pyro_forget_all()
            object.__delattr__(self, name)

    def __call__(self, *args, **kwargs):
        with self._pyro_context:
            return self.forward(*args, **kwargs)

    def forward(self, *args, **kwargs):
        raise NotImplementedError

    def named_pyro_params(self, prefix: str = ""):
        """Iterate (name, current value) over Pyro-managed params,
        including submodules."""
        for name in self._pyro_params:
            yield _make_name(self._pyro_prefix, name), getattr(self, name)
        for key, value in self.__dict__.items():
            if isinstance(value, PyroModule):
                yield from value.named_pyro_params()

    def named_parameters(self, _prefix: str = ""):
        """Unconstrained leaves, reference-style: a constrained param ``y``
        appears as ``y_unconstrained``, submodule params as dotted paths
        relative to this module (ref torch recursion through
        ``nn/module.py:PyroModule``)."""
        from ..params.param_store import get_param_store

        store = get_param_store()
        for name, p in self._pyro_params.items():
            getattr(self, name)  # ensure registered in the store
            full = _make_name(self._pyro_prefix, name)
            is_real = p.constraint is _constraints.real
            leaf = store.get_all_unconstrained()[full]
            rel = name if is_real else name + "_unconstrained"
            yield _make_name(_prefix, rel), leaf
        for key, value in self.__dict__.items():
            if isinstance(value, PyroModule):
                yield from value.named_parameters(_make_name(_prefix, key))

    def modules(self):
        """Yield self and all submodules (ref torch ``Module.modules``)."""
        yield self
        for value in self.__dict__.values():
            if isinstance(value, PyroModule):
                yield from value.modules()


class PyroModuleList(PyroModule):
    """List container of submodules (ref ``nn/module.py``
    ``PyroModuleList``)."""

    def __init__(self, modules=()):
        super().__init__()
        self._modules_list = []
        for m in modules:
            self.append(m)

    def append(self, module):
        idx = len(self._modules_list)
        setattr(self, str(idx), module)
        self._modules_list.append(getattr(self, str(idx), module))
        return self

    def __getitem__(self, idx):
        if isinstance(idx, slice):
            # share the underlying modules WITHOUT re-parenting them (their
            # site names stay owned by the original list, as in torch where
            # ModuleList slicing shares module-local parameters)
            out = PyroModuleList()
            for j, i in enumerate(range(*idx.indices(len(self)))):
                m = self.__dict__[str(i)]
                object.__setattr__(out, str(j), m)
                out._modules_list.append(m)
            return out
        if idx < 0:
            idx += len(self)
        return self.__dict__[str(idx)]

    def __len__(self):
        return len(self._modules_list)

    def __iter__(self):
        return (self[i] for i in range(len(self)))


def pyro_method(fn: Callable) -> Callable:
    """Decorator enabling per-call sample caching on PyroModule methods
    (ref ``nn/module.py:826``)."""
    import functools

    @functools.wraps(fn)
    def wrapper(self, *args, **kwargs):
        with self._pyro_context:
            return fn(self, *args, **kwargs)

    return wrapper


def to_pyro_module_(module, recurse: bool = True):
    """API-parity stub (ref ``nn/module.py:to_pyro_module_``): converts a
    torch module in place.  There is no torch module system here; build a
    :class:`PyroModule` directly or use the flax bridge."""
    raise NotImplementedError(
        "to_pyro_module_ converts torch.nn.Modules; use PyroModule "
        "directly or pyro_tpu.nn.flax_module for flax modules."
    )
