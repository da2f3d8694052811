"""Neural-network bridge: register flax module params as pyro params.

Ref ``pyro/primitives.py:429`` (``pyro.module`` registering torch.nn
params under ``{name}$$${param}``) and ``pyro/nn/module.py:339``
(PyroModule).  The JAX equivalent: ``flax_module`` initializes a
``flax.linen.Module`` once, registers every leaf in the global param store
(so SVI optimizes them like any ``pyro.param``), and returns an apply
function that reads current values through the effect runtime — hence
differentiable under the jitted SVI step.

``random_flax_module`` lifts the parameters to sample sites under a prior
(Bayesian NN; ref ``random_module``/``lift``).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..params.param_store import param_with_module_name
from ..primitives import param as pyro_param
from ..primitives import sample as pyro_sample

# name -> (treedef, leaf paths) so apply can rebuild the param pytree
_MODULE_REGISTRY: Dict[str, Any] = {}


def _flatten_with_paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)
    leaves = [(jax.tree_util.keystr(path), leaf) for path, leaf in flat[0]]
    return leaves, flat[1]


def flax_module(name: str, nn_module, *args, rng_key=None, **kwargs) -> Callable:
    """Register a flax module and return a bound apply function.

    First call initializes via ``nn_module.init(key, *args, **kwargs)``;
    subsequent calls reuse the registered params.
    """
    from ..params.param_store import _PARAM_STORE

    if rng_key is None:
        rng_key = jax.random.key(0)
    # re-init if never seen OR the store was cleared since registration —
    # the reference's pyro.module re-registers on every call because the
    # torch module owns its tensors (primitives.py:429); here the store
    # owns them, so detect eviction and rebuild
    registered = name in _MODULE_REGISTRY and all(
        param_with_module_name(name, p) in _PARAM_STORE
        for p in _MODULE_REGISTRY[name][1]
    )
    if not registered:
        variables = nn_module.init(rng_key, *args, **kwargs)
        leaves, treedef = _flatten_with_paths(variables)
        _MODULE_REGISTRY[name] = (treedef, [p for p, _ in leaves])
        for path, leaf in leaves:
            pyro_param(param_with_module_name(name, path), leaf)
    treedef, paths = _MODULE_REGISTRY[name]
    current = [
        pyro_param(param_with_module_name(name, path)) for path in paths
    ]
    variables = jax.tree_util.tree_unflatten(treedef, current)

    def apply_fn(*call_args, **call_kwargs):
        return nn_module.apply(variables, *call_args, **call_kwargs)

    return apply_fn


def random_flax_module(
    name: str, nn_module, prior, *args, rng_key=None, **kwargs
) -> Callable:
    """Bayesian flax module: parameters become sample sites under ``prior``
    (a Distribution, or dict path->Distribution).  Ref ``random_module`` /
    ``pyro/contrib/bnn``."""
    if rng_key is None:
        rng_key = jax.random.key(0)
    reg_key = name + "$$bayesian"
    if reg_key not in _MODULE_REGISTRY:
        variables = nn_module.init(rng_key, *args, **kwargs)
        leaves, treedef = _flatten_with_paths(variables)
        _MODULE_REGISTRY[reg_key] = (
            treedef,
            [(p, jnp.shape(l)) for p, l in leaves],
        )
    treedef, path_shapes = _MODULE_REGISTRY[reg_key]
    current = []
    for path, shape in path_shapes:
        site_name = param_with_module_name(name, path)
        if isinstance(prior, dict):
            d = prior.get(path)
            if d is None:
                raise KeyError(f"no prior for parameter '{path}'")
        else:
            d = prior
        d_shaped = d.expand(shape).to_event(len(shape))
        current.append(pyro_sample(site_name, d_shaped))
    variables = jax.tree_util.tree_unflatten(treedef, current)

    def apply_fn(*call_args, **call_kwargs):
        return nn_module.apply(variables, *call_args, **call_kwargs)

    return apply_fn


def clear_module_registry() -> None:
    _MODULE_REGISTRY.clear()
