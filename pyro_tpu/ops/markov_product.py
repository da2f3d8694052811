"""Parallel-scan elimination of vectorized Markov time dimensions.

Works on the packed factor representation of ``TraceEnum_ELBO``
(ref ``contrib/funsor/infer/traceenum_elbo.py`` uses funsor's
``sequential_sum_product``; this is the native equivalent).  Given a
trace containing ``markov_chain`` records (written by
``poutine.vectorized_markov``), factors carrying the time-plate symbol
are combined into per-step transition factors over the joint Markov
state and eliminated, leaving ordinary factors for the generic
tensor-variable-elimination contraction to finish.

Two elimination strategies, chosen per chain:

1. **Boundary-absorbed forward scan** (the common case: ``history==1``,
   one Markov var, absorbable endpoint factors).  The chain's left
   endpoint factors (the un-vectorized first step's transition and
   emissions) are absorbed into an initial potential ``alpha0`` and the
   whole chain is contracted by a ``lax.scan`` of batched
   ``logsumexp`` matvecs — O(T·S²·B) FLOPs, the same contraction order
   a sequential opt_einsum elimination would pick, and per-step
   operands built from *compact* factors (the homogeneous transition
   stays O(S²), never materialized at (B,T,S,S)).

2. **O(log T) pairwise log-matmul product** (general fallback:
   ``history>=2``, multiple interleaved vars, per-step local enum dims,
   or non-absorbable boundaries).  Builds the (T, ..., S, S) joint
   transition matrices time-major and reduces them with ceil(log2 T)
   rounds of batched MXU log-matmuls — O(T·S³·B) FLOPs but O(log T)
   depth, leaving an endpoint-pair factor.

The scan wins wall-clock whenever the batched per-step work keeps the
chip busy (S² per step); the matrix product wins only when depth
dominates (tiny batch, very long T on multiple chips).  Strategy 1 is
therefore the default whenever it applies.
"""

from __future__ import annotations

import jax
from jax.scipy.special import logsumexp
import jax.numpy as jnp

from . import packed
from .log_matmul import logmatmulexp, sequential_logmatmulexp_timemajor

# Opt-in storage dtype for the (T, plates, S)-shaped time-varying scan
# inputs (emission factors) — the dominant HBM traffic of the scan
# elimination.  ``jnp.bfloat16`` halves the bytes the fwd AND bwd scans
# stream from HBM; all arithmetic (the alpha carry, logmatmulexp, the
# loop-invariant transition) stays f32, so only factor STORAGE loses
# precision (~3 decimal digits in the log factor, i.e. ~1e-2 relative
# in the per-step potential).  Default None = keep the trace dtype.
# Set via ``pyro_tpu.settings.set(enum_factor_dtype=jnp.bfloat16)``.
FACTOR_DTYPE = None

# scan-body unroll factor: each iteration is microseconds of MXU work,
# so loop overhead is visible; XLA fuses across unrolled bodies.
# Sweep measured on v5e (hmm_enum_mxu512 training steps/s):
# unroll 8 -> 287.2, 16 -> 314.7, 32 -> 314.0; 16 is the knee.
SCAN_UNROLL = 16


def _packed_sum(terms):
    """Sum log factors, aligning to the union of their dims."""
    parts = packed.broadcast_all(*terms)
    val = parts[0].value
    for p in parts[1:]:
        val = val + p.value
    return val, parts[0].dims


def _reduce_to_ordinal(term, ordinal, target_ordinal, sym_size):
    """Plate-product a factor down from ``ordinal`` to ``target_ordinal``:
    sum plate dims present in the factor, multiply by plate size for
    plates the factor is constant over."""
    val, dims = term.value, term.dims
    mult = 1.0
    for sym in ordinal - target_ordinal:
        if sym in dims:
            ax = dims.index(sym)
            val = val.sum(axis=ax)
            dims = dims[:ax] + dims[ax + 1 :]
        else:
            mult = mult * sym_size[sym]
    if mult != 1.0:
        val = val * mult
    return packed.PackedTensor(val, dims)


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
        # carrying the time symbol, plus (when the factor is constant
        # over the vectorized span, or the axis was squeezed on packing)
        # factors inside the time ordinal that touch the chain's enum
        # symbols
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
        target_ordinal = base_ordinal - {time_sym}

        # product over plates strictly inside the chain's ordinal
        reduced = [
            _reduce_to_ordinal(term, t, base_ordinal, sym_size)
            for t, term in consumed
        ]

        V, h = len(chain_set), history
        union_dims = set().union(*[set(x.dims) for x in reduced])
        local = [
            d
            for d in union_dims
            if d not in chain_syms and d != time_sym and d not in sym_size
        ]

        done = False
        if V == 1 and h == 1 and not local:
            done = _try_scan_elimination(
                log_factors,
                sum_dims,
                reduced,
                int_syms[0][0],
                slice_syms[0][0],
                slice_syms[0][1],
                sizes[0],
                time_sym,
                target_ordinal,
                sym_size,
            )
        if done:
            continue

        # ---- general fallback: O(log T) pairwise matrix product ----
        A, A_dims = _packed_sum(reduced)

        # sum out per-step local (non-markov) enum dims
        if local:
            axes = tuple(A_dims.index(d) for d in local)
            A = logsumexp(A, axis=axes)
            A_dims = "".join(d for d in A_dims if d not in local)

        # lay out TIME-MAJOR as (time, plates..., slot_{v,0..h} per var):
        # pair-halving then slices on the major axis, which XLA turns
        # into cheap block DMAs instead of minor-axis strided copies
        other = "".join(
            d for d in A_dims if d not in chain_syms and d != time_sym
        )
        slot_order = [slice_syms[v][i] for v in range(V) for i in range(h + 1)]
        target = time_sym + other + "".join(slot_order)
        A = packed.align(packed.PackedTensor(A, A_dims), target).value
        nb = 1 + len(other)
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

        # O(log T) chain reduction over the major time axis
        R = sequential_logmatmulexp_timemajor(M)  # (plates..., S, S)

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

        log_factors.setdefault(target_ordinal, []).append(term)
        sum_dims.update(left_syms)
        sum_dims.update(right_syms)
    return sum_dims


def _try_scan_elimination(
    log_factors,
    sum_dims,
    reduced,
    i_sym,
    l_sym,
    r_sym,
    size,
    time_sym,
    target_ordinal,
    sym_size,
):
    """Attempt boundary-absorbed forward-scan elimination of one chain.

    Returns True on success (``log_factors``/``sum_dims`` updated) or
    False to fall back to the matrix-product path, in which case
    nothing outside the consumed time factors has been touched.
    """
    # every remaining factor mentioning the chain's left endpoint must
    # be absorbable: dims over plates + the endpoint only, at an ordinal
    # at or inside the chain's
    absorbed = []
    for t in log_factors:
        for x in log_factors[t]:
            if i_sym not in x.dims:
                continue
            if set(x.dims) <= (set(sym_size) | {i_sym}) and t >= target_ordinal:
                absorbed.append((t, x))
            else:
                return False
    if not absorbed:
        return False

    absorbed_reduced = [
        _reduce_to_ordinal(x, t, target_ordinal, sym_size)
        for t, x in absorbed
    ]

    plate_syms = sorted(
        d
        for d in set().union(
            *[set(x.dims) for x in reduced + absorbed_reduced]
        )
        if d in sym_size and d != time_sym
    )
    other = "".join(plate_syms)
    other_shape = tuple(sym_size[d] for d in plate_syms)

    # initial potential over the left endpoint
    alpha0 = 0.0
    for x in absorbed_reduced:
        alpha0 = alpha0 + packed.align(x, other + i_sym).value
    alpha0 = jnp.broadcast_to(alpha0, other_shape + (size,))

    # per-step transition factors, kept compact: time-varying terms
    # become scan inputs, time-constant ones (e.g. a homogeneous
    # transition matrix, never materialized at (B, T, S, S)) close over
    # the body.  Factors are classified by which chain endpoints they
    # touch: emissions depend only on the current state (r) and a
    # homogeneous transition only on (l, r) with no time axis, so the
    # common step contracts alpha against ONE loop-invariant (l, r)
    # matrix — a batched MXU matmul via ``logmatmulexp`` — instead of
    # building the (plates, l, r) joint elementwise on the VPU every
    # step (measured 4 ms forward at T=128, B=32, S=256 for the
    # elementwise body vs MXU-bound for the matmul form).
    tv_lr, tv_l, tv_r, c_lr, c_l, c_r = [], [], [], [], [], []
    for x in reduced:
        assert set(x.dims) <= set(other) | {time_sym, l_sym, r_sym}, x.dims
        has_l = l_sym in x.dims
        if time_sym in x.dims:
            if has_l and r_sym in x.dims:
                tv_lr.append(
                    packed.align(
                        x, time_sym + other + l_sym + r_sym
                    ).value
                )
            elif has_l:
                tv_l.append(
                    packed.align(x, time_sym + other + l_sym).value
                )
            else:  # r-only (or endpoint-free: broadcasts over r)
                tv_r.append(
                    packed.align(x, time_sym + other + r_sym).value
                )
        else:
            if has_l and r_sym in x.dims:
                c_lr.append(packed.align(x, other + l_sym + r_sym).value)
            elif has_l:
                c_l.append(packed.align(x, other + l_sym).value)
            else:
                c_r.append(packed.align(x, other + r_sym).value)

    def _sum_terms(terms):
        tot = terms[0]
        for v in terms[1:]:
            tot = tot + v
        return tot

    if c_lr and not tv_lr:
        # MXU path: alpha' = r_terms + logmatmulexp(alpha + l_terms, A)
        A = _sum_terms(c_lr)  # (plates-or-1..., l, r), loop-invariant
        Lc = _sum_terms(c_l) if c_l else None
        Rc = _sum_terms(c_r) if c_r else None
        # When the transition is SHARED across plates (leading dims all
        # 1 — the homogeneous-HMM common case), flatten the plate batch
        # into matmul ROWS: one (B, l) @ (l, r) MXU matmul per step.
        # The batched form (B, 1, l) @ (l, r) has M=1 per batch item,
        # which XLA lowers to a VPU broadcast-multiply-reduce (the
        # compiled flagship step had ZERO dot ops before this).
        A_shared = all(d == 1 for d in A.shape[:-2])
        A2 = A.reshape(A.shape[-2:]) if A_shared else None

        def step(alpha, xs_t):
            els, ers = xs_t
            h = alpha
            for v in els:
                h = h + v.astype(alpha.dtype)
            if Lc is not None:
                h = h + Lc
            if A_shared:
                hf = h.reshape((-1, h.shape[-1]))
                z = logmatmulexp(hf, A2).reshape(
                    h.shape[:-1] + (A2.shape[-1],)
                )
            else:
                z = logmatmulexp(h[..., None, :], A)[..., 0, :]
            for v in ers:
                z = z + v.astype(z.dtype)
            if Rc is not None:
                z = z + Rc
            return z, None

        scan_xs = (tuple(tv_l), tuple(tv_r))
    else:
        # general body: time-varying (l, r) coupling (heterogeneous
        # transitions) — build the per-step joint elementwise
        consts = list(c_lr)
        for v in c_l:
            consts.append(v[..., :, None])
        for v in c_r:
            consts.append(v[..., None, :])

        def step(alpha, xs_t):
            els, ers, elrs = xs_t
            M = 0.0
            for v in elrs:
                M = M + v.astype(alpha.dtype)
            for v in els:
                M = M + v.astype(alpha.dtype)[..., :, None]
            for v in ers:
                M = M + v.astype(alpha.dtype)[..., None, :]
            for v in consts:
                M = M + v
            # alpha: (plates..., l); M: (plates-or-1..., l, r)
            out = logsumexp(alpha[..., :, None] + M, axis=-2)
            return out, None

        scan_xs = (tuple(tv_l), tuple(tv_r), tuple(tv_lr))

    # remat the body: reverse-mode AD of a plain scan stacks the body's
    # (plates..., l, r) intermediate as a (T, plates..., l, r) residual
    # in HBM (measured 2.1 GB/step at T=128, B=32, S=256 — 90% of the
    # step's memory traffic); checkpointing saves only the (T, ..., l)
    # alpha carries and recomputes each step's joint inside the fused
    # backward body (ref funsor's lazy sequential_sum_product never
    # stores the joint either)
    # unroll=8: each iteration is microseconds of work, so loop overhead
    # is visible (measured 372 -> 405 steps/s at T=128, B=32, S=256 on
    # v5e going from unroll 1 -> 8); XLA fuses across unrolled bodies
    if FACTOR_DTYPE is not None:
        # cast the (T, ...)-stacked scan inputs ONCE, outside the loop:
        # the fwd scan and the remat bwd scan then stream half the bytes
        scan_xs = jax.tree_util.tree_map(
            lambda v: v.astype(FACTOR_DTYPE), scan_xs
        )
    alpha, _ = jax.lax.scan(
        jax.checkpoint(step), alpha0, scan_xs, unroll=SCAN_UNROLL
    )

    # remove the absorbed factors
    absorbed_ids = {id(x) for _, x in absorbed}
    for t in list(log_factors):
        kept = [x for x in log_factors[t] if id(x) not in absorbed_ids]
        if kept:
            log_factors[t] = kept
        else:
            del log_factors[t]

    term = packed.PackedTensor(alpha, other + r_sym)
    log_factors.setdefault(target_ordinal, []).append(term)
    sum_dims.discard(i_sym)
    sum_dims.discard(l_sym)
    sum_dims.add(r_sym)
    return True
