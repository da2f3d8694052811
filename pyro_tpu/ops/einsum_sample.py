"""Single-pass exact joint sampling over the enumeration contraction tree.

Ref ``pyro/ops/einsum/adjoint.py`` + ``torch_sample.py`` (the "sample
ring"): the reference draws a joint posterior sample of ALL enumerated
variables with one forward contraction plus one backward sweep.  Here
the forward pass is the ordinary tensor-variable-elimination contraction
(``contract_to_tensor``) run with a taping ``LogRing``; the backward
pass replays the tape in reverse — clique-tree backward sampling:

* a tape entry recorded the step's input messages and kept dims; the
  dims it eliminated are exactly the variables whose factors are fully
  absorbed at that step, so their conditional given every
  later-eliminated (= already-sampled) variable is the normalized sum
  of the input messages, gathered at the sampled values;
* eliminated dims are drawn jointly from one flattened categorical
  (Gumbel-max, magnitude-safe), per plate slice.

``temperature=0`` runs the forward in the tropical (max) ring so the
backward argmax is the exact joint MAP (Viterbi); ``temperature=1`` is
exact posterior sampling.  Either way the contraction count is ONE,
independent of the number of sites (the previous implementation did one
full contraction per site, ``infer/discrete.py`` round-2 note).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import packed
from .contract import contract_to_tensor
from .packed import PackedTensor
from .rings import LogRing


def sample_tensor_tree(
    tensor_tree, sum_dims, rng_key, temperature=1, dim_to_size=None
):
    """Draw one exact joint sample (or MAP decode) of every dim in
    ``sum_dims``.  Returns ``{symbol: PackedTensor of int32 indices}``
    where each index tensor carries the plate dims of its context.
    """
    tape = []
    ring = LogRing(
        dim_to_size=dict(dim_to_size or {}),
        tape=tape,
        use_max=(temperature == 0),
    )
    contract_to_tensor(tensor_tree, set(sum_dims), ring=ring)

    sampled = {}
    n_steps = len(tape)
    keys = (
        jax.random.split(rng_key, n_steps) if n_steps else []
    )
    for step_idx in range(n_steps - 1, -1, -1):
        operands, out_dims = tape[step_idx]
        union = sorted(set().union(*[set(t.dims) for t in operands]))
        elim = [d for d in union if d not in out_dims]
        if not elim:
            continue
        target = "".join(union)
        val = packed.align(operands[0], target).value
        for t in operands[1:]:
            val = val + packed.align(t, target).value
        cur = PackedTensor(val, target)
        # condition on dims sampled by later-eliminating steps
        for d in union:
            if d in sampled and d not in elim:
                cur = packed.gather(cur, sampled[d], d)
        # joint draw over the eliminated dims, per plate slice
        rest = "".join(d for d in cur.dims if d not in elim)
        sizes = {d: cur.size(d) for d in cur.dims}
        al = packed.align(cur, rest + "".join(elim))
        elim_sizes = [sizes.get(d, 1) for d in elim]
        n_elim = 1
        for s in elim_sizes:
            n_elim *= s
        flat = al.value.reshape(al.value.shape[: len(rest)] + (n_elim,))
        if temperature == 0:
            z = jnp.argmax(flat, axis=-1)
        elif temperature == 1:
            z = jax.random.categorical(keys[step_idx], flat, axis=-1)
        else:
            z = jax.random.categorical(
                keys[step_idx], flat / temperature, axis=-1
            )
        # unravel the flat index into per-dim indices (row-major)
        stride = n_elim
        for d, s in zip(elim, elim_sizes):
            stride //= s
            idx = (z // stride) % s
            sampled[d] = PackedTensor(idx.astype(jnp.int32), rest)
    return sampled
