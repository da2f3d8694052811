"""Tensor variable elimination over plated factor trees.

Ref ``pyro/ops/contract.py`` (``contract_tensor_tree:163``,
``contract_to_tensor:205``, plate-aware ``einsum``/``ubersum:276,486``) and
the TVE paper (arXiv:1902.03210).  Ordinals are frozensets of plate *symbols*
(single chars); sum dims are enum symbols; terms are PackedTensors.
"""

from __future__ import annotations

from collections import OrderedDict, defaultdict
from typing import Dict, List, Set, Tuple

import jax.numpy as jnp

from .packed import PackedTensor
from .rings import LogRing


def _check_plates_are_sensible(output_dims, nonoutput_ordinal):
    if output_dims and nonoutput_ordinal:
        raise ValueError(
            f"It is nonsensical to preserve a plated dim without preserving "
            f"all of that dim's plates, but found '{output_dims}' without "
            f"'{','.join(nonoutput_ordinal)}'"
        )


def _check_tree_structure(parent, leaf):
    if parent == leaf:
        raise NotImplementedError(
            "Expected tree-structured plate nesting, but found dependencies "
            "on independent plates. Try converting one of the vectorized "
            "plates to a sequential plate (but beware exponential cost in "
            "the size of the sequence)"
        )


def _partition_terms(terms: List[PackedTensor], dims: Set[str]):
    """Split (terms, dims) into connected components sharing sum dims
    (ref ``contract.py:38``)."""
    neighbors: "OrderedDict" = OrderedDict(
        [(t, []) for t in terms] + [(d, []) for d in sorted(dims)]
    )
    for term in terms:
        for dim in term.dims:
            if dim in dims:
                neighbors[term].append(dim)
                neighbors[dim].append(term)

    components = []
    while neighbors:
        v, pending = neighbors.popitem()
        component = OrderedDict([(v, None)])
        for p in pending:
            component[p] = None
        pending = list(pending)
        while pending:
            v = pending.pop()
            for u in neighbors.pop(v, []):
                if u not in component:
                    component[u] = None
                    pending.append(u)
        component_terms = [
            v for v in component if isinstance(v, PackedTensor)
        ]
        if component_terms:
            component_dims = {
                v for v in component if not isinstance(v, PackedTensor)
            }
            components.append((component_terms, component_dims))
    return components


def _contract_component(ring, tensor_tree, sum_dims, target_dims):
    """Contract ``sum_dims - target_dims`` in a tree of packed tensors via
    message passing, reducing to one tensor in the minimum plate context
    (ref ``contract.py:81``)."""
    # group sum dims by the minimal ordinal in which they appear
    dim_to_ordinal: Dict[str, frozenset] = {}
    for t, terms in tensor_tree.items():
        for term in terms:
            for dim in sum_dims.intersection(term.dims):
                dim_to_ordinal[dim] = dim_to_ordinal.get(dim, t) & t
    dims_tree = defaultdict(set)
    for dim, t in dim_to_ordinal.items():
        dims_tree[t].add(dim)

    local_terms: List[PackedTensor] = []
    local_dims = set(target_dims)
    local_ordinal: frozenset = frozenset()
    min_ordinal = frozenset.intersection(*tensor_tree)
    while any(dims_tree.values()):
        leaf = max(tensor_tree, key=len)
        leaf_terms = tensor_tree.pop(leaf)
        leaf_dims = dims_tree.pop(leaf, set())

        for terms, dims in _partition_terms(leaf_terms, leaf_dims):
            term = ring.sumproduct(terms, dims - local_dims)

            if leaf == min_ordinal:
                parent = leaf
            else:
                pending_dims = sum_dims.intersection(term.dims)
                parents = [
                    t for t, d in dims_tree.items() if d & pending_dims
                ]
                parent = (
                    frozenset.union(*parents) if parents else min_ordinal
                )
                _check_tree_structure(parent, leaf)
                contract_frames = leaf - parent
                contract_dims = dims & local_dims
                if contract_dims:
                    term, local_term = ring.global_local(
                        term, contract_dims, contract_frames
                    )
                    local_terms.append(local_term)
                    local_dims |= sum_dims.intersection(local_term.dims)
                    local_ordinal |= leaf
                else:
                    term = ring.product(term, contract_frames)
            tensor_tree.setdefault(parent, []).append(term)

    # combine any remaining terms at their ordinals down to min_ordinal
    while len(tensor_tree) > 1 or (
        tensor_tree and next(iter(tensor_tree)) != min_ordinal
    ):
        leaf = max(tensor_tree, key=len)
        leaf_terms = tensor_tree.pop(leaf)
        term = ring.sumproduct(leaf_terms, set())
        if leaf != min_ordinal:
            term = ring.product(term, leaf - min_ordinal)
        tensor_tree.setdefault(min_ordinal, []).append(term)
    ordinal, terms = tensor_tree.popitem()
    term = ring.sumproduct(terms, set())
    assert ordinal == min_ordinal

    if local_terms:
        assert target_dims
        local_terms.append(term)
        term = ring.sumproduct(local_terms, local_dims - target_dims)
        ordinal = ordinal | local_ordinal

    return ordinal, term


def contract_tensor_tree(tensor_tree, sum_dims, ring=None):
    """Ref ``contract.py:163``."""
    assert isinstance(tensor_tree, OrderedDict)
    sum_dims = set(sum_dims)
    if ring is None:
        ring = LogRing()

    ordinals = {
        term: t for t, terms in tensor_tree.items() for term in terms
    }
    all_terms = [term for terms in tensor_tree.values() for term in terms]
    contracted_tree: "OrderedDict" = OrderedDict()

    for terms, dims in _partition_terms(all_terms, sum_dims):
        component: "OrderedDict" = OrderedDict()
        for term in terms:
            component.setdefault(ordinals[term], []).append(term)
        ordinal, term = _contract_component(ring, component, dims, set())
        contracted_tree.setdefault(ordinal, []).append(term)

    return contracted_tree


def contract_to_tensor(
    tensor_tree, sum_dims, target_ordinal=None, target_dims=None, ring=None
):
    """Ref ``contract.py:205``: contract everything down to one tensor in
    the plate context ``target_ordinal``, optionally keeping
    ``target_dims``."""
    if target_ordinal is None:
        target_ordinal = frozenset()
    if target_dims is None:
        target_dims = set()
    sum_dims = set(sum_dims)
    assert target_dims <= sum_dims
    if ring is None:
        ring = LogRing()

    ordinals = {
        term: t for t, terms in tensor_tree.items() for term in terms
    }
    all_terms = [term for terms in tensor_tree.values() for term in terms]
    contracted_terms: List[PackedTensor] = []

    modulo_total = bool(target_dims)
    for terms, dims in _partition_terms(all_terms, sum_dims):
        if modulo_total and dims.isdisjoint(target_dims):
            continue
        component: "OrderedDict" = OrderedDict()
        for term in terms:
            component.setdefault(ordinals[term], []).append(term)
        ordinal, term = _contract_component(
            ring, component, dims, target_dims & dims
        )
        _check_plates_are_sensible(
            target_dims.intersection(term.dims), ordinal - target_ordinal
        )
        contract_frames = ordinal - target_ordinal
        if contract_frames:
            assert not (set(term.dims) & sum_dims) - target_dims
            term = ring.product(term, contract_frames)
        contracted_terms.append(term)

    if not contracted_terms:
        contracted_terms = [PackedTensor(jnp.zeros(()), "")]
    term = ring.sumproduct(contracted_terms, set())
    return ring.broadcast(term, target_ordinal)


def _validate_sizes(inputs, operands):
    """Consistent per-symbol sizes across operands (ref raises
    'Dimension size mismatch')."""
    sizes: Dict[str, int] = {}
    for inp, op in zip(inputs, operands):
        for d, sz in zip(inp, jnp.shape(op)):
            old = sizes.setdefault(d, sz)
            if old != sz:
                raise ValueError(
                    f"Dimension size mismatch at dim '{d}': {sz} vs {old}"
                )
    return sizes


def ubersum(equation: str, *operands, plates: str = "", backend=None):
    """Plate-aware log-space einsum (ref ``contract.py:276`` ``einsum`` with
    the pyro.ops.einsum.torch_log backend; multiple comma-separated outputs
    supported)."""
    inputs, outputs = equation.split("->")
    inputs = inputs.split(",")
    outputs = outputs.split(",")
    _validate_sizes(inputs, operands)
    packed_terms = [
        PackedTensor(jnp.asarray(x), dims)
        for x, dims in zip(operands, inputs)
    ]
    plate_set = set(plates)
    results = []
    for output in outputs:
        output_set = set(output)
        # build a tensor tree: ordinal = plates present in each term
        tensor_tree: "OrderedDict" = OrderedDict()
        sum_dims = set()
        for term in packed_terms:
            ordinal = frozenset(d for d in term.dims if d in plate_set)
            tensor_tree.setdefault(ordinal, []).append(term)
            sum_dims |= set(term.dims) - plate_set
        target_ordinal = frozenset(d for d in output if d in plate_set)
        target_dims = output_set - plate_set
        term = contract_to_tensor(
            tensor_tree,
            sum_dims,
            target_ordinal=target_ordinal,
            target_dims=target_dims,
        )
        from .packed import align

        full = align(term, "".join(sorted(set(term.dims) | output_set)))
        # order axes as the output spec
        order = [full.dims.index(d) for d in output]
        value = jnp.transpose(
            full.value, order + [i for i in range(len(full.dims)) if full.dims[i] not in output]
        )
        results.append(value.reshape([full.shape[full.dims.index(d)] for d in output]))
    return tuple(results)


def _naive_log_einsum(equation: str, *operands):
    """Flat (plate-free) log-space einsum by greedy variable elimination
    (the full-joint broadcast is exponential on deep factor chains)."""
    from jax.scipy.special import logsumexp

    inputs, output = equation.split("->")
    terms = [
        (list(inp), jnp.asarray(op))
        for inp, op in zip(inputs.split(","), operands)
    ]

    def broadcast_sum(group):
        dims: list = []
        for gdims, _ in group:
            for d in gdims:
                if d not in dims:
                    dims.append(d)
        total = 0.0
        for gdims, val in group:
            perm = sorted(
                range(len(gdims)), key=lambda i: dims.index(gdims[i])
            )
            v = jnp.transpose(val, perm)
            od = [gdims[i] for i in perm]
            shape = [1] * len(dims)
            j = 0
            for i, d in enumerate(dims):
                if j < len(od) and od[j] == d:
                    shape[i] = v.shape[j]
                    j += 1
            total = total + v.reshape(shape)
        return dims, jnp.broadcast_to(
            total,
            tuple(
                max(
                    (
                        val.shape[gdims.index(d)]
                        for gdims, val in group
                        if d in gdims
                    ),
                    default=1,
                )
                for d in dims
            ),
        )

    elim = [
        d
        for d in {d for dims, _ in terms for d in dims}
        if d not in output
    ]
    while elim:
        best = min(
            elim,
            key=lambda d: len(
                {x for dims, _ in terms if d in dims for x in dims}
            ),
        )
        group = [t for t in terms if best in t[0]]
        rest = [t for t in terms if best not in t[0]]
        dims, merged = broadcast_sum(group)
        ax = dims.index(best)
        merged = logsumexp(merged, axis=ax)
        dims.pop(ax)
        terms = rest + [(dims, merged)]
        elim.remove(best)
    dims, total = broadcast_sum(terms) if terms else ([], jnp.zeros(()))
    order = [dims.index(d) for d in output]
    extra = [i for i in range(len(dims)) if dims[i] not in output]
    assert not extra
    return jnp.transpose(total, order)


def naive_ubersum(equation: str, *operands, plates: str = ""):
    """Naive reference implementation of :func:`ubersum` via plate
    UNROLLING (ref ``contract.py:486``): every plate slice of every
    operand becomes a separate flat operand with fresh symbols for its
    plate-local contraction dims, then a plain log-einsum runs per
    output plate index.  Supports product-reduced plates (plate dims
    absent from an output)."""
    import itertools as _it

    import numpy as _np

    inputs_str, outputs_str = equation.split("->")
    outputs = outputs_str.split(",")
    if len(outputs) > 1:
        return tuple(
            naive_ubersum(
                inputs_str + "->" + output, *operands, plates=plates
            )[0]
            for output in outputs
        )
    (output,) = outputs
    inputs = inputs_str.split(",")
    plate_set = set(plates)
    sizes = _validate_sizes(inputs, operands)
    if not plate_set:
        return (_naive_log_einsum(equation, *operands),)

    # plate context of each contraction dim = intersection over inputs
    dim_to_ordinal: dict = {}
    for dims in map(set, inputs):
        ordinal = dims & plate_set
        for d in dims - plate_set:
            dim_to_ordinal[d] = dim_to_ordinal.get(d, ordinal) & ordinal

    # preserving a plate-local sum dim without all of its plates is
    # nonsensical (ref contract.py:307 _check_plates_are_sensible)
    output_plates = set(output) & plate_set
    for d in output:
        if d not in plate_set:
            if d not in dim_to_ordinal:
                # ref contract.py raises KeyError here; a clear error now
                # beats a confusing broadcast failure during unrolling
                raise ValueError(
                    f"output dim {d!r} is neither a plate nor present "
                    "in any input"
                )
            missing = dim_to_ordinal[d] - output_plates
            _check_plates_are_sensible({d}, missing)

    symbol_table: dict = {}
    counter = _it.count()

    def unroll(d, indices):
        key = (
            d,
            tuple(
                indices[p] for p in sorted(dim_to_ordinal.get(d, ()))
            ),
        )
        if key not in symbol_table:
            symbol_table[key] = chr(0x4E00 + next(counter))
        return symbol_table[key]

    flat_inputs = []
    flat_operands = []
    for inp, op in zip(inputs, operands):
        local = [d for d in inp if d in plate_set]
        positions = [inp.index(d) for d in local]
        for index in _it.product(*(range(sizes[d]) for d in local)):
            idx_map = dict(zip(local, index))
            flat_inputs.append(
                "".join(
                    unroll(d, idx_map) for d in inp if d not in plate_set
                )
            )
            sel = [slice(None)] * len(inp)
            for pos, i in zip(positions, index):
                sel[pos] = i
            flat_operands.append(jnp.asarray(op)[tuple(sel)])

    out_plates = [d for d in output if d in plate_set]
    if not out_plates:
        flat_output = "".join(
            unroll(d, {}) for d in output if d not in plate_set
        )
        flat_eq = ",".join(flat_inputs) + "->" + flat_output
        return (_naive_log_einsum(flat_eq, *flat_operands),)

    result = _np.zeros(tuple(sizes[d] for d in output), dtype=_np.float64)
    for index in _it.product(*(range(sizes[d]) for d in out_plates)):
        idx_map = dict(zip(out_plates, index))
        flat_output = "".join(
            unroll(d, idx_map) for d in output if d not in plate_set
        )
        flat_eq = ",".join(flat_inputs) + "->" + flat_output
        flat_result = _naive_log_einsum(flat_eq, *flat_operands)
        sel = []
        it = iter(index)
        for d in output:
            sel.append(next(it) if d in plate_set else slice(None))
        result[tuple(sel)] = _np.asarray(flat_result)
    return (jnp.asarray(result, jnp.result_type(float)),)
