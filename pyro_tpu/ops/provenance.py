"""Provenance (data-dependency) tracking.

Ref ``pyro/ops/provenance.py`` (ProvenanceTensor taint tracking).  The JAX
equivalent uses jvp tangents: see ``pyro_tpu.infer.inspect.get_dependencies``
— a symbolic tangent on an upstream value marks every downstream quantity
that depends on it.  These helpers expose that mechanism directly.
"""

from __future__ import annotations

from typing import Callable, FrozenSet, Tuple

import jax
import jax.numpy as jnp


def track_provenance(fn: Callable, inputs: dict) -> dict:
    """Returns {output_key: frozenset(input_keys it depends on)} for a fn
    mapping a dict of float arrays to a dict of float arrays."""
    deps = {}
    keys = list(inputs)
    for probe in keys:
        tangents = tuple(
            jnp.ones_like(v) if k == probe else jnp.zeros_like(v)
            for k, v in inputs.items()
        )
        _, out_t = jax.jvp(
            lambda *vals: fn(dict(zip(keys, vals))),
            tuple(inputs.values()),
            tangents,
        )
        for out_key, tan in out_t.items():
            if bool(jnp.any(tan != 0)):
                deps.setdefault(out_key, set()).add(probe)
    return {k: frozenset(v) for k, v in deps.items()}


def get_provenance(deps, key) -> FrozenSet:
    return deps.get(key, frozenset())


def jaxpr_provenance(fn: Callable, inputs: dict) -> dict:
    """Exact data-flow provenance via jaxpr analysis.

    Returns ``{output_key: frozenset(input_keys)}`` for ``fn`` mapping a
    dict of arrays to a dict of arrays, by tainting each input variable and
    propagating taints through the jaxpr's equations.  Unlike
    :func:`track_provenance` this never evaluates data (no
    ``ConcretizationError`` under ``jit``) and costs ONE abstract trace of
    ``fn`` instead of one jvp per input.  The JAX analogue of the
    reference's ``ProvenanceTensor`` taint tracking
    (``pyro/ops/provenance.py:14``).

    Equations carrying a sub-jaxpr with matching arity (``pjit``,
    ``custom_jvp/vjp``, ``remat``) are recursed into for per-output
    precision; anything else (``scan``, ``while``, ``cond``, …) uses the
    sound overapproximation *every output depends on every input* — that
    can only widen a taint set, never drop a true dependency.
    """
    keys = list(inputs)
    vals = [inputs[k] for k in keys]
    closed, out_shape = jax.make_jaxpr(
        lambda *v: fn(dict(zip(keys, v))), return_shape=True
    )(*vals)
    out_keys = [
        path[0].key
        for path, _ in jax.tree_util.tree_flatten_with_path(out_shape)[0]
    ]
    # inputs may be pytrees in principle; here each input is one leaf
    in_taints = [frozenset([k]) for k in keys]
    out_taints = _propagate_taints(closed.jaxpr, in_taints)
    assert len(out_taints) == len(out_keys), (len(out_taints), len(out_keys))
    return dict(zip(out_keys, out_taints))


_RECURSIBLE = frozenset(
    ["pjit", "closed_call", "custom_jvp_call", "custom_vjp_call", "remat2",
     "checkpoint", "custom_vjp_call_jaxpr"]
)


def _propagate_taints(jaxpr, in_taints):
    from jax._src import core as _core

    taint = {}
    for v, t in zip(jaxpr.invars, in_taints):
        taint[v] = t

    def read(a):
        if isinstance(a, _core.Literal):
            return frozenset()
        return taint.get(a, frozenset())

    for eqn in jaxpr.eqns:
        handled = False
        if eqn.primitive.name in _RECURSIBLE:
            inner = eqn.params.get("jaxpr") or eqn.params.get("call_jaxpr")
            if inner is not None:
                inner = getattr(inner, "jaxpr", inner)
                if len(inner.invars) == len(eqn.invars):
                    outs = _propagate_taints(
                        inner, [read(v) for v in eqn.invars]
                    )
                    if len(outs) == len(eqn.outvars):
                        for v, t in zip(eqn.outvars, outs):
                            taint[v] = t
                        handled = True
        if not handled:
            ins = frozenset().union(*(read(v) for v in eqn.invars)) if (
                eqn.invars
            ) else frozenset()
            for v in eqn.outvars:
                taint[v] = ins
    return [read(v) for v in jaxpr.outvars]
