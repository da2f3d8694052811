"""Parallel-scan elimination of vectorized Markov time dimensions.

Works on the packed factor representation of ``TraceEnum_ELBO``
(ref ``contrib/funsor/infer/traceenum_elbo.py`` uses funsor's
``sequential_sum_product``; this is the native equivalent).  Given a
trace containing ``markov_chain`` records (written by
``poutine.vectorized_markov``), factors carrying the time-plate symbol
are combined into per-step transition matrices over the joint Markov
state and reduced with ``_sequential_logmatmulexp`` — ceil(log2 T)
rounds of batched MXU log-matmuls — leaving an ordinary factor over the
chain's endpoint variables for the generic tensor-variable-elimination
contraction to finish.
"""

from __future__ import annotations

from jax.scipy.special import logsumexp
import jax.numpy as jnp

from . import packed


def _packed_sum(terms):
    """Sum log factors, aligning to the union of their dims."""
    parts = packed.broadcast_all(*terms)
    val = parts[0].value
    for p in parts[1:]:
        val = val + p.value
    return val, parts[0].dims


def eliminate_markov_chains(model_trace, log_factors, sum_dims):
    """Eliminate every vectorized-markov time dim in ``log_factors``.

    Mutates ``log_factors`` (an OrderedDict ordinal -> [PackedTensor])
    in place and returns the updated ``sum_dims`` set.
    """
    chain_nodes = [
        node
        for node in model_trace.nodes.values()
        if node["type"] == "markov_chain" and node["value"]
    ]
    if not chain_nodes:
        return sum_dims
    from ..distributions.hmm import _sequential_logmatmulexp

    sum_dims = set(sum_dims)

    # plate symbol -> tensor size (for factors constant over a plate)
    sym_size = {}
    for site in model_trace.nodes.values():
        if site["type"] != "sample":
            continue
        for frame in site["cond_indep_stack"]:
            if frame.dim is not None:
                sym = model_trace.plate_to_symbol[frame.name]
                sym_size[sym] = frame.subsample_size or frame.size

    for node in chain_nodes:
        history = node["infer"]["history"]
        time_sym = model_trace.plate_to_symbol.get(
            node["infer"]["plate_name"]
        )
        if time_sym is None:
            continue
        chain_set = sorted(node["value"])

        # enum symbols: per markov var, the history int sites and the
        # history+1 slice-pass sites
        int_syms, slice_syms, sizes = [], [], []
        for tup in chain_set:
            ints, slices = tup[:history], tup[history:]
            try:
                i_syms = [
                    model_trace.nodes[n]["infer"]["_enumerate_symbol"]
                    for n in ints
                ]
                s_syms = [
                    model_trace.nodes[n]["infer"]["_enumerate_symbol"]
                    for n in slices
                ]
            except KeyError as e:
                raise NotImplementedError(
                    "vectorized_markov requires every Markov variable to "
                    "be enumerated in the model "
                    "(infer={'enumerate': 'parallel'}); missing for site "
                    f"in chain {tup}"
                ) from e
            int_syms.append(i_syms)
            slice_syms.append(s_syms)
            final = model_trace.nodes[slices[-1]]
            sizes.append(
                final["packed"]["unscaled_log_prob"].size(s_syms[-1])
            )

        # collect and remove every factor of the time plate: those
        # carrying the time symbol, plus (when the vectorized span has
        # length 1 and the axis was squeezed on packing) factors inside
        # the time ordinal that touch the chain's enum symbols
        chain_syms = {s for var in slice_syms for s in var}

        def _is_time_factor(ordinal, x):
            if time_sym in x.dims:
                return True
            return time_sym in ordinal and bool(chain_syms & set(x.dims))

        consumed = []
        for t in list(log_factors):
            kept = [x for x in log_factors[t] if not _is_time_factor(t, x)]
            took = [x for x in log_factors[t] if _is_time_factor(t, x)]
            consumed.extend((t, x) for x in took)
            if kept:
                log_factors[t] = kept
            else:
                del log_factors[t]
        if not consumed:
            continue
        base_ordinal = frozenset.intersection(
            *[t for t, _ in consumed]
        )
        assert time_sym in base_ordinal

        # product over plates strictly inside the chain's ordinal
        reduced = []
        for t, term in consumed:
            val, dims = term.value, term.dims
            mult = 1.0
            for sym in t - base_ordinal:
                if sym in dims:
                    ax = dims.index(sym)
                    val = val.sum(axis=ax)
                    dims = dims[:ax] + dims[ax + 1 :]
                else:
                    mult = mult * sym_size[sym]
            if mult != 1.0:
                val = val * mult
            reduced.append(packed.PackedTensor(val, dims))
        A, A_dims = _packed_sum(reduced)

        # sum out per-step local (non-markov) enum dims
        local = [
            d
            for d in A_dims
            if d not in chain_syms and d != time_sym and d not in sym_size
        ]
        if local:
            axes = tuple(A_dims.index(d) for d in local)
            A = logsumexp(A, axis=axes)
            A_dims = "".join(d for d in A_dims if d not in local)

        # lay out as (plates..., time, slot_{v,0..h} per var)
        V, h = len(chain_set), history
        other = "".join(
            d for d in A_dims if d not in chain_syms and d != time_sym
        )
        slot_order = [slice_syms[v][i] for v in range(V) for i in range(h + 1)]
        target = other + time_sym + "".join(slot_order)
        A = packed.align(packed.PackedTensor(A, A_dims), target).value
        nb = len(other) + 1
        full = A.shape[:nb] + tuple(
            sizes[v] for v in range(V) for _ in range(h + 1)
        )
        A = jnp.broadcast_to(A, full)

        # right-hand duplicates of the middle slots (history >= 2): the
        # transition matrix constrains window overlap with log-deltas
        mid_axes = {}
        for v in range(V):
            for i in range(1, h):
                K = sizes[v]
                src = nb + v * (h + 1) + i
                A = jnp.broadcast_to(
                    A[..., None], A.shape + (K,)
                )
                mask_shape = [
                    K if ax in (src, A.ndim - 1) else 1
                    for ax in range(A.ndim)
                ]
                mask = jnp.eye(K, dtype=bool).reshape(mask_shape)
                A = jnp.where(mask, A, -jnp.inf)
                mid_axes[(v, i)] = A.ndim - 1

        left_axes = [
            nb + v * (h + 1) + i for v in range(V) for i in range(h)
        ]
        right_axes = [
            mid_axes[(v, i)] if i < h else nb + v * (h + 1) + h
            for v in range(V)
            for i in range(1, h + 1)
        ]
        batch_axes = list(range(nb))
        M = jnp.transpose(A, batch_axes + left_axes + right_axes)
        S = 1
        for v in range(V):
            S *= sizes[v] ** h
        M = M.reshape(M.shape[:nb] + (S, S))

        # O(log T) chain reduction over the time axis (axis nb-1)
        R = _sequential_logmatmulexp(
            jnp.moveaxis(M, nb - 1, -3)
        )  # (plates..., S, S)

        # unpack windows back to per-slot dims and name them:
        # left window -> the int-step vars; right window -> the aux
        # middle syms (now free) + the final-pass syms
        per_slot = tuple(
            sizes[v] for v in range(V) for _ in range(h)
        )
        R = R.reshape(R.shape[:-2] + per_slot + per_slot)
        left_syms = [int_syms[v][i] for v in range(V) for i in range(h)]
        right_syms = [
            slice_syms[v][i] for v in range(V) for i in range(1, h + 1)
        ]
        new_dims = other + "".join(left_syms) + "".join(right_syms)
        assert len(set(new_dims)) == len(new_dims), new_dims
        term = packed.PackedTensor(R, new_dims)

        target_ordinal = base_ordinal - {time_sym}
        log_factors.setdefault(target_ordinal, []).append(term)
        sum_dims.update(left_syms)
        sum_dims.update(right_syms)
    return sum_dims
