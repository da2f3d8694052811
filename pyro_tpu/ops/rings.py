"""Algebraic rings over packed log-space tensors.

Ref ``pyro/ops/rings.py`` (``Ring:14``, ``LogRing:178``, ``MapRing:260``)
and the einsum backends ``pyro/ops/einsum/torch_log.py`` / ``torch_map.py``.

TPU-native log-sum-exp einsum: contractions are folded pairwise; each
pairwise step max-shifts both operands over the axes being summed (shifts
detached and clamped finite), performs a *real* einsum of the shifted
exponentials — a plain matmul XLA tiles onto the MXU — then returns to log
space.  This is the "log-einsum-exp on the MXU" strategy from SURVEY §2.8
P3 (a fused Pallas kernel was built, measured slower than XLA's own
fusion at every bench shape, and retired — see ops/log_matmul.py).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Sequence, Set

import jax
import jax.numpy as jnp

from .packed import PackedTensor, align


def _symbol_ids(dims_list: Sequence[str], out_dims: str):
    table: Dict[str, int] = {}
    for dims in list(dims_list) + [out_dims]:
        for d in dims:
            table.setdefault(d, len(table))
    return [[table[d] for d in dims] for dims in dims_list], [
        table[d] for d in out_dims
    ]


def _finite(x):
    return jnp.where(jnp.isfinite(x), x, 0.0)


def _shift(p: PackedTensor, out_dims: str):
    """Max over axes not in out_dims (detached, finite), keepdims.

    When NO axis of ``p`` is summed (all dims kept), the shift is the
    detached operand itself — exp(0)=1 exactly, so a running chain
    factor can grow arbitrarily large in log space without overflowing
    the exp (gradient is exact: each output element carries its own
    shift, restored additively)."""
    axes = tuple(i for i, d in enumerate(p.dims) if d not in out_dims)
    if not axes:
        m = _finite(jax.lax.stop_gradient(p.value))
        return p.value - m, PackedTensor(m, p.dims)
    m = jax.lax.stop_gradient(
        jnp.max(p.value, axis=axes, keepdims=True)
    )
    m = _finite(m)
    return p.value - m, PackedTensor(
        jnp.squeeze(m, axis=axes), "".join(d for d in p.dims if d in out_dims)
    )


def logsumexp_pair(x: PackedTensor, y: PackedTensor, out_dims: str) -> PackedTensor:
    """log-space contraction of two packed tensors to out_dims.

    The matmul-shaped case (ab,bc->ac) routes to the max-shifted MXU
    matmul with analytic VJP (ops/log_matmul.py)."""
    if (
        len(x.dims) == 2
        and len(y.dims) == 2
        and len(out_dims) == 2
        and x.dims[1] == y.dims[0]
        and out_dims == x.dims[0] + y.dims[1]
        and x.dims[0] != x.dims[1]
        and y.dims[0] != y.dims[1]
    ):
        from .log_matmul import logmatmulexp as _fused

        return PackedTensor(_fused(x.value, y.value), out_dims)
    xv, xshift = _shift(x, out_dims)
    yv, yshift = _shift(y, out_dims)
    (ix, iy), io = _symbol_ids([x.dims, y.dims], out_dims)
    z = jnp.einsum(jnp.exp(xv), ix, jnp.exp(yv), iy, io)
    tiny = jnp.finfo(z.dtype).tiny
    result = jnp.log(jnp.clip(z, tiny))
    out = PackedTensor(result, out_dims)
    for shift in (xshift, yshift):
        if shift is not None:
            out = PackedTensor(
                out.value + align(shift, out_dims).value, out_dims
            )
    return out


def logsumexp_single(x: PackedTensor, out_dims: str) -> PackedTensor:
    axes = tuple(i for i, d in enumerate(x.dims) if d not in out_dims)
    if not axes:
        return align(x, out_dims) if x.dims != out_dims else x
    v = jax.scipy.special.logsumexp(x.value, axis=axes)
    return align(
        PackedTensor(v, "".join(d for d in x.dims if d in out_dims)),
        out_dims,
    )


def max_pair(x: PackedTensor, y: PackedTensor, out_dims: str) -> PackedTensor:
    """Max-product (tropical) contraction of two packed log factors —
    the Viterbi forward used for temperature=0 joint MAP decoding
    (ref ``pyro/ops/einsum/torch_map.py``)."""
    target = "".join(sorted(set(x.dims) | set(y.dims)))
    val = align(x, target).value + align(y, target).value
    axes = tuple(i for i, d in enumerate(target) if d not in out_dims)
    if axes:
        val = jnp.max(val, axis=axes)
    return align(
        PackedTensor(val, "".join(d for d in target if d in out_dims)),
        out_dims,
    )


def max_single(x: PackedTensor, out_dims: str) -> PackedTensor:
    axes = tuple(i for i, d in enumerate(x.dims) if d not in out_dims)
    if not axes:
        return align(x, out_dims) if x.dims != out_dims else x
    v = jnp.max(x.value, axis=axes)
    return align(
        PackedTensor(v, "".join(d for d in x.dims if d in out_dims)),
        out_dims,
    )


def logsumexp_contract(
    terms: List[PackedTensor],
    sum_dims: Set[str],
    tape: List = None,
    use_max: bool = False,
) -> PackedTensor:
    """Contract a list of log factors, eliminating ``sum_dims``.

    With ``tape`` given, every reduction step is recorded as
    ``(operands, out_dims)`` in forward order — the backward-sampling
    pass of ``ops/einsum_sample.py`` replays it in reverse to draw
    exact joint posterior samples (ref ``ops/einsum/adjoint.py``'s
    sample ring).  ``use_max=True`` switches to the tropical ring
    (Viterbi) for temperature=0 MAP.

    The pairwise order comes from ``opt_einsum.contract_path`` (as the
    reference's einsum backend does, ``pyro/ops/einsum/__init__.py``):
    The pairwise order comes from ``opt_einsum.contract_path``: a naive
    left-fold in list order can be catastrophically bad — for a Markov
    chain whose emission factors are listed after all transition
    factors it materializes the joint over every enumerated dim
    (exponential memory and float32 saturation) where the optimized
    path contracts the chain incrementally in O(T * K^2)."""
    pair = max_pair if use_max else logsumexp_pair
    single = max_single if use_max else logsumexp_single

    def record(op, out_dims):
        if tape is not None:
            tape.append((op, out_dims))

    if len(terms) == 1 and not sum_dims:
        return terms[0]
    if len(terms) == 1:
        out_dims = "".join(
            d for d in terms[0].dims if d not in sum_dims
        )
        record([terms[0]], out_dims)
        return single(terms[0], out_dims)
    all_dims = set()
    for t in terms:
        all_dims |= set(t.dims)
    out_dims = "".join(sorted(all_dims - set(sum_dims)))

    import opt_einsum

    eq = ",".join(t.dims for t in terms) + "->" + out_dims
    path, _ = opt_einsum.contract_path(
        eq, *[t.shape for t in terms], shapes=True
    )
    operands = list(terms)
    for step in path:
        popped = [operands.pop(i) for i in sorted(step, reverse=True)]
        remaining: Set[str] = set(out_dims)
        for t in operands:
            remaining |= set(t.dims)
        involved = set()
        for t in popped:
            involved |= set(t.dims)
        step_out = "".join(sorted(involved & remaining))
        if len(popped) == 1:
            record([popped[0]], step_out)
            result = single(popped[0], step_out)
        else:
            result = popped[0]
            for k in range(1, len(popped)):
                later: Set[str] = set()
                for t in popped[k + 1 :]:
                    later |= set(t.dims)
                keep = (set(result.dims) | set(popped[k].dims)) & (
                    set(step_out) | later
                )
                record([result, popped[k]], "".join(sorted(keep)))
                result = pair(
                    result, popped[k], "".join(sorted(keep))
                )
        operands.append(result)
    assert len(operands) == 1
    return align(operands[0], out_dims)


class LogRing:
    """Ref ``rings.py:178`` (LogRing): sum-product in log space; plate
    'product' is a plain sum over the plate axis."""

    def __init__(
        self,
        cache=None,
        dim_to_size: Dict[str, int] = None,
        tape: List = None,
        use_max: bool = False,
    ):
        self._cache = {} if cache is None else cache
        self._dim_to_size: Dict[str, int] = dict(dim_to_size or {})
        self._tape = tape
        self._use_max = use_max

    def _observe(self, term: PackedTensor):
        for d, s in zip(term.dims, term.shape):
            self._dim_to_size[d] = s

    def sumproduct(self, terms: List[PackedTensor], dims) -> PackedTensor:
        dims = set(dims)
        for t in terms:
            self._observe(t)
        if len(terms) == 1 and not dims:
            return terms[0]
        if not terms:
            return PackedTensor(jnp.zeros(()), "")
        return logsumexp_contract(
            list(terms), dims, tape=self._tape, use_max=self._use_max
        )

    def product(self, term: PackedTensor, ordinal) -> PackedTensor:
        """Product over plate instances = sum of logs over plate axes."""
        self._observe(term)
        axes = tuple(
            i for i, d in enumerate(term.dims) if d in ordinal
        )
        if not axes:
            return term
        value = jnp.sum(term.value, axis=axes)
        dims = "".join(d for i, d in enumerate(term.dims) if i not in axes)
        return PackedTensor(value, dims)

    def inv(self, term: PackedTensor) -> PackedTensor:
        self._observe(term)
        value = -term.value
        value = jnp.where(jnp.isnan(value), -jnp.inf, value)
        return PackedTensor(value, term.dims)

    def broadcast(self, term: PackedTensor, ordinal) -> PackedTensor:
        self._observe(term)
        missing = "".join(sorted(set(ordinal) - set(term.dims)))
        if not missing:
            return term
        # dims never observed in any factor were squeezed as size-1
        missing_shape = tuple(self._dim_to_size.get(d, 1) for d in missing)
        value = jnp.broadcast_to(
            term.value, missing_shape + term.shape
        )
        return PackedTensor(value, missing + term.dims)

    def global_local(self, term: PackedTensor, dims, ordinal):
        """Inclusion-exclusion split (ref ``rings.py:104``):
        global = product(sum(term, dims), ordinal);
        local = term / sum(term, dims)."""
        assert dims
        term_sum = self.sumproduct([term], dims)
        global_part = self.product(term_sum, ordinal)
        local_part = self.sumproduct([term, self.inv(term_sum)], set())
        return global_part, local_part
