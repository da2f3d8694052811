"""Adjoint (one-backward-pass) marginals for the enumeration engine.

Ref ``pyro/ops/einsum/adjoint.py``: the reference computes marginals /
MAP / samples for all queries with a single backward message-passing
sweep over the einsum tree.  On TPU the natural implementation of the
marginal sweep is automatic differentiation of the log-partition
function: for packed log-factors ``f_i``,

    logZ = log sum_x exp( sum_i f_i(x_i) )
    dlogZ / df_i(v) = p(x_i = v)           (the exponential-family identity)

so ``jax.grad`` of one forward contraction yields the posterior
marginals of EVERY factor simultaneously — one forward + one backward
pass, both fused by XLA, instead of one contraction per query.
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, List, Tuple

import jax
import jax.numpy as jnp

from .contract import contract_tensor_tree
from .packed import PackedTensor
from .rings import LogRing


def _tree_to_flat(log_factors):
    """Flatten OrderedDict[ordinal -> [PackedTensor]] into (values, spec)."""
    values = []
    spec = []
    for ordinal, terms in log_factors.items():
        for term in terms:
            values.append(term.value)
            spec.append((ordinal, term.dims))
    return values, spec


def _flat_to_tree(values, spec):
    tree: "OrderedDict" = OrderedDict()
    for value, (ordinal, dims) in zip(values, spec):
        tree.setdefault(ordinal, []).append(PackedTensor(value, dims))
    return tree


def log_partition(log_factors, sum_dims) -> jnp.ndarray:
    """Total log normalizer: eliminate all enum dims by tensor variable
    elimination, then sum the remaining (plate) dims — plates factorize,
    so the joint logZ is the sum of per-slice logZs."""
    dim_to_size: Dict[str, int] = {}
    for terms in log_factors.values():
        for term in terms:
            dim_to_size.update(zip(term.dims, term.shape))
    ring = LogRing(dim_to_size=dim_to_size)
    reduced = contract_tensor_tree(
        OrderedDict((t, list(terms)) for t, terms in log_factors.items()),
        sum_dims,
        ring=ring,
    )
    total = jnp.zeros(())
    for terms in reduced.values():
        for term in terms:
            total = total + jnp.sum(term.value)
    return total


def adjoint_marginals(
    log_factors, sum_dims
) -> Tuple[jnp.ndarray, "OrderedDict"]:
    """Compute ``(logZ, marginals)`` where ``marginals`` mirrors the
    structure of ``log_factors`` and each entry is the posterior joint
    marginal over that factor's dims (enum dims normalized per plate
    slice).  One forward + one backward pass for all factors."""
    values, spec = _tree_to_flat(log_factors)

    def logZ_of(vals):
        return log_partition(_flat_to_tree(vals, spec), sum_dims)

    logZ, grads = jax.value_and_grad(logZ_of)(values)
    marginals = _flat_to_tree(grads, spec)
    return logZ, marginals


def marginal_of_dims(marginal: PackedTensor, keep_dims, sum_dims):
    """Reduce a factor's joint marginal to the marginal over
    ``keep_dims``: sum out the other enumeration dims (plate dims are
    kept — they index independent slices, each normalized)."""
    drop = [
        d
        for d in marginal.dims
        if d in sum_dims and d not in keep_dims
    ]
    value = marginal.value
    dims = marginal.dims
    for d in drop:
        axis = dims.index(d)
        value = jnp.sum(value, axis=axis)
        dims = dims[:axis] + dims[axis + 1 :]
    return PackedTensor(value, dims)
