"""MAP/posterior sampling of enumerated discrete latents.

Ref ``pyro/infer/discrete.py:181`` (``infer_discrete``, ``_sample_posterior
:41``).  Like the reference's adjoint backward pass over the einsum graph
(``MapRing``/``SampleRing``): ONE taping forward contraction + one
backward sweep draws the exact joint posterior sample (or, at
temperature=0, the exact joint MAP via the tropical ring) for every
enumerated site simultaneously — contraction count is independent of
the number of sites (``ops/einsum_sample.py``).
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import jax
import jax.numpy as jnp

from .. import poutine
from ..ops import packed
from ..ops.packed import PackedTensor
from ..poutine.enum_messenger import EnumMessenger
from ..poutine.util import prune_subsample_sites


def _sample_posterior(model, first_available_dim, temperature, rng_key, *args, **kwargs):
    """Ref ``discrete.py:41``."""
    key_trace, key_sample = jax.random.split(rng_key)
    enum_model = EnumMessenger(first_available_dim=first_available_dim)(
        poutine.seed(model, rng_key=key_trace)
    )
    with poutine.block():
        trace = poutine.trace(enum_model).get_trace(*args, **kwargs)
    trace = prune_subsample_sites(trace)
    trace.compute_log_prob()
    trace.pack_tensors()

    # collect factors and the enumerated sites; a factor's ordinal comes
    # from its site's plate context (cond_indep_stack), NOT from its
    # dims — enumerated sites keep compact log_probs (constant-over-
    # plate factors carry no plate axis), so dims understate the ordinal
    log_factors = []
    enum_sites = OrderedDict()
    sum_dims = set()
    for name, site in trace.nodes.items():
        if site["type"] != "sample":
            continue
        if site["infer"].get("_do_not_score"):
            continue
        ordinal = frozenset(
            trace.plate_to_symbol[f.name]
            for f in site["cond_indep_stack"]
            if f.dim is not None
        )
        log_factors.append((ordinal, site["packed"]["log_prob"]))
        if site["infer"].get("_enumerate_dim") is not None:
            enum_sites[name] = site
            sum_dims.add(site["infer"]["_enumerate_symbol"])

    if any(
        s["type"] == "markov_chain" and s["value"]
        for s in trace.nodes.values()
    ):
        raise NotImplementedError(
            "infer_discrete does not yet support vectorized_markov; "
            "use pyro.markov (unrolled) for posterior sampling"
        )

    # one taping forward contraction + one backward sweep samples the
    # exact joint over ALL enumerated sites (ops/einsum_sample.py)
    from ..ops.einsum_sample import sample_tensor_tree

    tensor_tree = OrderedDict()
    present_dims = set()
    dim_to_size = {}
    for f_ordinal, f in log_factors:
        tensor_tree.setdefault(f_ordinal, []).append(f)
        present_dims |= set(f.dims) & sum_dims
        dim_to_size.update(zip(f.dims, f.shape))
    sampled = sample_tensor_tree(
        tensor_tree,
        present_dims,
        key_sample,
        temperature=temperature,
        dim_to_size=dim_to_size,
    )
    samples = {}
    for name, site in enum_sites.items():
        symbol = site["infer"]["_enumerate_symbol"]
        if symbol in sampled:
            z_packed = sampled[symbol]
        else:  # degenerate: the site's dim appears in no factor
            z_packed = PackedTensor(jnp.zeros((), jnp.int32), "")
        samples[name] = (site, z_packed)

    # build a value dict in unpacked (broadcast) shape
    data = {}
    for name, (site, z_packed) in samples.items():
        enum_dim = site["infer"]["_enumerate_dim"]
        support = site["fn"].enumerate_support(expand=False)
        # support: (n,) + 1s + event; index with z
        z = packed.unpack(z_packed, trace.symbol_to_dim)
        event_dim = site["fn"].event_dim
        if support.ndim == 1 + event_dim + len(site["fn"].batch_shape) and all(
            s == 1 for s in support.shape[1 : support.ndim - event_dim]
        ):
            flat_support = support.reshape(
                (support.shape[0],) + support.shape[support.ndim - event_dim:]
            )
        else:
            flat_support = support
        value = jnp.take(flat_support, z.astype(jnp.int32), axis=0)
        data[name] = value

    # replay the model with sampled discrete values
    return poutine.condition(model, data=data), data


def infer_discrete(fn=None, first_available_dim=None, temperature=1, rng_key=None):
    """Ref ``discrete.py:181``: returns a model whose enumerated discrete
    sites are sampled (temperature=1) or MAP-decoded (temperature=0) from
    their exact joint posterior."""
    if fn is None:
        return functools.partial(
            infer_discrete,
            first_available_dim=first_available_dim,
            temperature=temperature,
            rng_key=rng_key,
        )

    @functools.wraps(fn)
    def _fn(*args, **kwargs):
        key = rng_key
        if key is None:
            from ..poutine.runtime import _next_eager_key

            key = _next_eager_key()
        conditioned, data = _sample_posterior(
            fn, first_available_dim, temperature, key, *args, **kwargs
        )
        return conditioned(*args, **kwargs)

    return _fn
