"""MAP/posterior sampling of enumerated discrete latents.

Ref ``pyro/infer/discrete.py:181`` (``infer_discrete``, ``_sample_posterior
:41``).  The reference uses an adjoint backward pass over the einsum graph
(``MapRing``/``SampleRing``); here the joint is sampled by reverse chain
rule: sites are visited in reverse trace order, each site's conditional
(given already-sampled downstream sites) is obtained by one
``contract_to_tensor`` query, then factors are gathered at the sampled
index.  O(n) contractions instead of one forward+backward pass — same
semantics, simpler machinery; the adjoint optimization is a later round.
"""

from __future__ import annotations

import functools
from collections import OrderedDict

import jax
import jax.numpy as jnp

from .. import poutine
from ..ops import packed
from ..ops.contract import contract_to_tensor
from ..ops.packed import PackedTensor
from ..ops.rings import LogRing
from ..poutine.enum_messenger import EnumMessenger
from ..poutine.util import prune_subsample_sites
from .traceenum_elbo import _find_ordinal


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

    # collect factors and the enumerated sites
    log_factors = []
    enum_sites = OrderedDict()
    sum_dims = set()
    for name, site in trace.nodes.items():
        if site["type"] != "sample":
            continue
        if site["infer"].get("_do_not_score"):
            continue
        log_factors.append(site["packed"]["log_prob"])
        if site["infer"].get("_enumerate_dim") is not None:
            enum_sites[name] = site
            sum_dims.add(site["infer"]["_enumerate_symbol"])

    samples = {}
    keys = jax.random.split(key_sample, max(len(enum_sites), 1))
    for i, (name, site) in enumerate(reversed(list(enum_sites.items()))):
        symbol = site["infer"]["_enumerate_symbol"]
        ordinal = _find_ordinal(trace, site)
        tensor_tree = OrderedDict()
        remaining_sum_dims = set()
        for f in log_factors:
            f_ordinal = frozenset(
                d for d in f.dims if d not in sum_dims
            )
            tensor_tree.setdefault(f_ordinal, []).append(f)
            remaining_sum_dims |= set(f.dims) & sum_dims
        logits_packed = contract_to_tensor(
            tensor_tree,
            remaining_sum_dims,
            target_ordinal=ordinal,
            target_dims={symbol},
        )
        # move the enum symbol's axis last, sample categorical
        out_dims = "".join(d for d in logits_packed.dims if d != symbol)
        full = packed.align(logits_packed, out_dims + symbol)
        logits = full.value
        if temperature == 0:
            z = jnp.argmax(logits, axis=-1)
        elif temperature == 1:
            z = jax.random.categorical(keys[i], logits, axis=-1)
        else:
            z = jax.random.categorical(
                keys[i], logits / temperature, axis=-1
            )
        z_packed = PackedTensor(z, out_dims)
        samples[name] = (site, z_packed)
        # condition all factors on z
        log_factors = [
            packed.gather(f, z_packed, symbol) if symbol in f.dims else f
            for f in log_factors
        ]

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
