"""Global parameter store.

Ref ``pyro/params/param_store.py:30`` (ParamStoreDict).  Stores
*unconstrained* arrays keyed by name; the constrained view is computed via
``transform_to(constraint)`` on access.  Unlike the reference (mutable
tensors with ``requires_grad``), gradients here come from ``jax.grad`` over
a functional loss, so the store doubles as the source/sink of the param
pytree that inference steps thread through ``jit``:

* ``get_all_unconstrained()`` → dict pytree handed to the optimizer
* ``set_all_unconstrained(pytree)`` → write back after a step
* ``ParamsMessenger`` (in svi) overrides param sites from a live pytree so
  the loss is a pure function of it.
"""

from __future__ import annotations

import pickle
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..distributions import constraints
from ..distributions.transforms import biject_to, transform_to


class ParamStoreDict:
    def __init__(self) -> None:
        self._params: Dict[str, jax.Array] = {}  # unconstrained
        self._constraints: Dict[str, Any] = {}

    def clear(self) -> None:
        self._params.clear()
        self._constraints.clear()

    # -- dict-like (constrained view, ref ``param_store.py:95-200``) ---------
    def items(self):
        for name in self._params:
            yield name, self[name]

    def keys(self):
        return self._params.keys()

    def values(self):
        for name in self._params:
            yield self[name]

    def __bool__(self):
        return bool(self._params)

    def __len__(self):
        return len(self._params)

    def __contains__(self, name):
        return name in self._params

    def __iter__(self):
        return iter(self.keys())

    def __delitem__(self, name):
        del self._params[name]
        del self._constraints[name]

    def __getitem__(self, name):
        unconstrained = self._params[name]
        transform = transform_to(self._constraints[name])
        return transform(unconstrained)

    def __setitem__(self, name, new_constrained_value):
        constraint = self._constraints.get(name, constraints.real)
        transform = transform_to(constraint)
        self._params[name] = transform.inv(jnp.asarray(new_constrained_value))
        self._constraints.setdefault(name, constraint)

    def setdefault(self, name, init_constrained_value, constraint=constraints.real):
        """Ref ``param_store.py:158``."""
        if name not in self._params:
            if callable(init_constrained_value):
                init_constrained_value = init_constrained_value()
            self._constraints[name] = constraint
            transform = transform_to(constraint)
            self._params[name] = transform.inv(
                jnp.asarray(init_constrained_value)
            )
        return self[name]

    # -- pyro-facing API --------------------------------------------------------
    def get_param(
        self,
        name: str,
        init_value=None,
        constraint=constraints.real,
        event_dim: Optional[int] = None,
    ):
        if init_value is None and name not in self:
            raise KeyError(f"param '{name}' does not exist and no init given")
        if init_value is None:
            return self[name]
        return self.setdefault(name, init_value, constraint)

    def param_name(self, p) -> Optional[str]:
        for name, value in self._params.items():
            if value is p:
                return name
        return None

    def named_parameters(self):
        """Unconstrained parameters (ref ``param_store.py:228``)."""
        return self._params.items()

    def get_constraint(self, name):
        return self._constraints[name]

    # -- functional bridge -------------------------------------------------------
    def get_all_unconstrained(self) -> Dict[str, jax.Array]:
        return dict(self._params)

    def set_all_unconstrained(self, params: Dict[str, jax.Array]) -> None:
        for name, value in params.items():
            if name in self._constraints:
                self._params[name] = value
            else:
                self._params[name] = value
                self._constraints[name] = constraints.real

    def constrain(self, name: str, unconstrained):
        return transform_to(self._constraints[name])(unconstrained)

    # -- persistence (ref ``param_store.py:276-373``) ------------------------------
    def get_state(self) -> dict:
        return {
            "params": {
                k: np.asarray(jax.device_get(v))
                for k, v in self._params.items()
            },
            "constraints": dict(self._constraints),
        }

    def set_state(self, state: dict) -> None:
        assert set(state.keys()) == {"params", "constraints"}
        self._params = {
            k: jnp.asarray(v) for k, v in state["params"].items()
        }
        self._constraints = dict(state["constraints"])

    def save(self, filename: str) -> None:
        with open(filename, "wb") as f:
            pickle.dump(self.get_state(), f)

    def load(self, filename: str) -> None:
        with open(filename, "rb") as f:
            state = pickle.load(f)
        self.set_state(state)

    @contextmanager
    def scope(self, state=None):
        """Isolate a param-store state (ref ``param_store.py:337``)."""
        old = (dict(self._params), dict(self._constraints))
        if state is not None:
            self.set_state(state)
        else:
            self.clear()
        try:
            yield self.get_state()
        finally:
            self._params, self._constraints = old


_MODULE_NAMESPACE_DIVIDER = "$$$"

_PARAM_STORE = ParamStoreDict()


def get_param_store() -> ParamStoreDict:
    return _PARAM_STORE


def clear_param_store() -> None:
    _PARAM_STORE.clear()


def param_with_module_name(pyro_name: str, param_name: str) -> str:
    return _MODULE_NAMESPACE_DIVIDER.join([pyro_name, param_name])


def module_from_param_with_module_name(param_name: str) -> str:
    return param_name.split(_MODULE_NAMESPACE_DIVIDER)[0]


def user_param_name(param_name: str) -> str:
    if _MODULE_NAMESPACE_DIVIDER in param_name:
        return param_name.split(_MODULE_NAMESPACE_DIVIDER)[1]
    return param_name
