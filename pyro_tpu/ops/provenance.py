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
