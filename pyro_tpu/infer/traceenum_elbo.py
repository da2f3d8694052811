"""TraceEnum_ELBO: exact marginalization of enumerated discrete variables.

Ref ``pyro/infer/traceenum_elbo.py:316`` (``_compute_dice_elbo:178``,
``_compute_model_factors:112``) and arXiv:1902.03210 (tensor variable
elimination).  Model-side enumerated variables are summed out exactly via
``contract_tensor_tree``; everything else is weighted by DiCE factors so the
single surrogate is differentiable.
"""

from __future__ import annotations

import math
from collections import OrderedDict

import jax
import jax.numpy as jnp

from .. import poutine
from ..ops import packed
from ..ops.contract import contract_tensor_tree, contract_to_tensor
from ..ops.rings import LogRing
from ..poutine.enum_messenger import EnumMessenger
from ..poutine.util import prune_subsample_sites
from .elbo import ELBO
from .util import Dice


def _find_ordinal(trace, site):
    return frozenset(
        trace.plate_to_symbol[f.name]
        for f in site["cond_indep_stack"]
        if f.dim is not None
    )


def _get_common_scale(scales):
    scales_set = set()
    for scale in scales:
        if not isinstance(scale, (int, float)):
            raise ValueError(
                "enumeration only supports scalar subsampling scales"
            )
        scales_set.add(float(scale))
    if len(scales_set) != 1:
        raise ValueError(
            f"enumeration expects a single common scale, got {scales_set}"
        )
    return scales_set.pop()


def _check_model_guide_enumeration_constraint(enum_ordinals, guide_trace):
    """Model-side enumeration must be no more global than guide-side
    enumeration: a model-enumerated variable outside a plate cannot be
    summed out exactly when a guide-enumerated variable inside that
    plate feeds the same cost terms (the sum over the model variable
    does not factorize across the plate).  Ref ``traceenum_elbo.py:50``.
    """
    min_ordinal = frozenset.intersection(*enum_ordinals)
    for name, site in guide_trace.nodes.items():
        if (
            site["type"] == "sample"
            and site["infer"].get("_enumerate_dim") is not None
        ):
            for f in site["cond_indep_stack"]:
                if (
                    f.dim is not None
                    and guide_trace.plate_to_symbol[f.name] not in min_ordinal
                ):
                    raise ValueError(
                        "Expected model enumeration to be no more global "
                        "than guide enumeration, but found model "
                        "enumeration sites upstream of guide site "
                        f"'{name}' in plate('{f.name}'). Try converting "
                        "some model enumeration sites to guide "
                        "enumeration sites."
                    )


def _compute_model_factors(model_trace, guide_trace):
    """Ref ``traceenum_elbo.py:112``."""
    ordering = {
        name: _find_ordinal(trace, site)
        for trace in (model_trace, guide_trace)
        for name, site in trace.nodes.items()
        if site["type"] == "sample"
    }
    cost_sites = OrderedDict()
    enum_sites = OrderedDict()
    enum_dims = set()
    non_enum_dims = set().union(*ordering.values()) if ordering else set()
    for name, site in model_trace.nodes.items():
        if site["type"] != "sample":
            continue
        if site["infer"].get("_do_not_score"):
            continue
        if name in guide_trace.nodes:
            cost_sites.setdefault(ordering[name], []).append(site)
            non_enum_dims.update(
                guide_trace.nodes[name]["packed"]["log_prob"].dims
            )
        elif site["infer"].get("_enumerate_dim") is None:
            cost_sites.setdefault(ordering[name], []).append(site)
        else:
            enum_sites.setdefault(ordering[name], []).append(site)
            enum_dims.update(site["packed"]["log_prob"].dims)
    enum_dims -= non_enum_dims
    log_factors = OrderedDict()
    scale = 1.0
    if not enum_sites:
        marginal_costs = OrderedDict(
            (t, [site["packed"]["log_prob"] for site in sites_t])
            for t, sites_t in cost_sites.items()
        )
        return marginal_costs, log_factors, ordering, enum_dims, scale

    _check_model_guide_enumeration_constraint(
        set(enum_sites.keys()), guide_trace
    )

    # marginalize out variables enumerated in the model
    marginal_costs = OrderedDict()
    scales = []
    for t, sites_t in cost_sites.items():
        for site in sites_t:
            if enum_dims.isdisjoint(site["packed"]["log_prob"].dims):
                marginal_costs.setdefault(t, []).append(
                    site["packed"]["log_prob"]
                )
            else:
                # mask inside, scale outside the log expectation
                cost = packed.scale_and_mask(
                    site["packed"]["unscaled_log_prob"],
                    mask=site["packed"]["mask"]
                    if not isinstance(site["packed"]["mask"], bool)
                    else None,
                )
                log_factors.setdefault(t, []).append(cost)
                scales.append(site["scale"])
    for t, sites_t in enum_sites.items():
        for site in sites_t:
            log_factors.setdefault(t, []).append(
                site["packed"]["unscaled_log_prob"]
            )
            scales.append(site["scale"])
    scale = _get_common_scale(scales)
    return marginal_costs, log_factors, ordering, enum_dims, scale


def _compute_dice_elbo(model_trace, guide_trace):
    """Ref ``traceenum_elbo.py:178``."""
    (
        marginal_costs,
        log_factors,
        ordering,
        sum_dims,
        scale,
    ) = _compute_model_factors(model_trace, guide_trace)
    if log_factors:
        from ..ops.markov_product import eliminate_markov_chains

        sum_dims = eliminate_markov_chains(
            model_trace, log_factors, sum_dims
        )
        dim_to_size = {}
        for terms in log_factors.values():
            for term in terms:
                dim_to_size.update(zip(term.dims, term.shape))
        ring = LogRing(dim_to_size=dim_to_size)
        log_factors = contract_tensor_tree(
            log_factors, sum_dims, ring=ring
        )
        for t, log_factors_t in log_factors.items():
            marginal_costs_t = marginal_costs.setdefault(t, [])
            for term in log_factors_t:
                term = packed.scale_and_mask(term, scale=scale)
                marginal_costs_t.append(term)
    costs = marginal_costs

    # accumulate negative guide costs
    for name, site in guide_trace.nodes.items():
        if site["type"] == "sample" and not site["infer"].get(
            "_do_not_score"
        ):
            cost = packed.neg(site["packed"]["log_prob"])
            costs.setdefault(ordering[name], []).append(cost)

    return Dice(guide_trace, ordering).compute_expectation(costs)


class _SequentialEscape(Exception):
    """Internal: a sequentially-enumerated site interrupted the guide;
    carries the partial trace (sites executed so far) and the escaped
    site message for queue extension."""

    def __init__(self, partial_trace, site):
        super().__init__(site.get("name"))
        self.partial_trace = partial_trace
        self.site = site


class TraceEnum_ELBO(ELBO):
    """Ref ``traceenum_elbo.py:316``."""

    def _get_trace_pair(
        self, model, guide, args, kwargs, rng_key, queue_trace=None
    ):
        """Run guide then replayed model, both under enumeration.

        With ``queue_trace`` (a partial trace fixing some sequentially-
        enumerated sites), the guide is replayed against it under an
        escape handler; hitting an unfixed sequential site raises
        ``_SequentialEscape`` carrying the partial trace for extension
        (ref ``traceenum_elbo.py:386-394`` queue-driven ``_get_traces``).
        """
        import functools

        import jax as _jax

        from ..poutine.handlers import EscapeMessenger
        from ..poutine.runtime import NonlocalExit
        from .enum import iter_discrete_escape

        key_guide, key_model = _jax.random.split(rng_key)
        first_dim = -1 - int(self.max_plate_nesting)
        # The EnumMessenger must be INNERMOST (process each site first):
        # queue branches replay parallel-enumerated sites recorded by the
        # escaped run, and the allocator must walk the SAME allocation
        # order on every branch — replay merely overwrites the (identical)
        # values afterwards (ref ``traceenum_elbo.py:383-391`` where
        # ``guide_enum(guide)`` is wrapped by ``poutine.queue``).
        guide_fn = EnumMessenger(first_available_dim=first_dim)(
            poutine.seed(guide, rng_key=key_guide)
        )
        if queue_trace is not None:
            guide_fn = EscapeMessenger(
                functools.partial(iter_discrete_escape, queue_trace)
            )(poutine.replay(guide_fn, trace=queue_trace))
        tracer = poutine.trace(guide_fn)
        try:
            guide_trace = tracer.get_trace(*args, **kwargs)
        except NonlocalExit as escape:
            escape.reset_stack()
            raise _SequentialEscape(
                tracer.msngr.get_trace(), escape.site
            ) from None
        return self._finish_trace_pair(
            model, guide_trace, args, kwargs, key_model
        )

    def _finish_trace_pair(self, model, guide_trace, args, kwargs, key_model):
        # the EnumMessenger must be INNERMOST (ref ``traceenum_elbo.py:
        # 383-385``: ``model = model_enum(model)`` wrapped by replay): it
        # has to process each site before replay marks it done, so that
        # every model site — including replayed latents downstream of an
        # enumerated guide site — records the allocator's dim_to_id for
        # log_prob packing.
        model_enum = poutine.seed(
            poutine.replay(
                EnumMessenger()(model),  # continue the same dim allocation
                trace=guide_trace,
            ),
            rng_key=key_model,
        )
        model_trace = poutine.trace(model_enum).get_trace(*args, **kwargs)

        guide_trace = prune_subsample_sites(guide_trace)
        model_trace = prune_subsample_sites(model_trace)
        # auxiliary vectorized-markov sites are never scored
        model_trace.compute_log_prob(
            site_filter=lambda name, site: not site["infer"].get(
                "_do_not_score"
            )
        )
        guide_trace.compute_score_parts()
        # pack with a shared plate-symbol namespace
        from .util import is_validation_enabled

        if is_validation_enabled():
            from ..util import check_model_guide_match, check_site_shape

            check_model_guide_match(
                model_trace, guide_trace, int(self.max_plate_nesting)
            )
            for tr in (model_trace, guide_trace):
                for site in tr.nodes.values():
                    if site["type"] == "sample":
                        check_site_shape(
                            site, int(self.max_plate_nesting)
                        )
        model_trace.pack_tensors()
        guide_trace.pack_tensors(model_trace.plate_to_symbol)
        return model_trace, guide_trace

    def _setup(self, model, guide, args, kwargs):
        if self.max_plate_nesting == float("inf"):
            self._guess_max_plate_nesting(model, guide, args, kwargs)

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        if self.vectorize_particles and self.num_particles > 1:
            model = self._vectorized_num_particles(model)
            guide = self._vectorized_num_particles(guide)
            keys = [rng_key]
        elif self.num_particles > 1:
            keys = list(jax.random.split(rng_key, self.num_particles))
        else:
            keys = [rng_key]
        elbo = 0.0
        for key in keys:
            for model_trace, guide_trace in self._iter_trace_pairs(
                model, guide, args, kwargs, key
            ):
                elbo_particle = _compute_dice_elbo(model_trace, guide_trace)
                elbo = elbo + elbo_particle / self.num_particles
        return -elbo

    def _iter_trace_pairs(self, model, guide, args, kwargs, rng_key):
        """Yield one (model, guide) trace pair per combination of
        sequentially-enumerated guide values — the LIFO-queue expansion
        of the reference's ``_get_traces`` (ref ``traceenum_elbo.py:
        386-394``).  Models/guides with no sequential sites yield exactly
        one pair with zero queue overhead."""
        from queue import LifoQueue

        from ..poutine.trace_struct import Trace
        from .enum import iter_discrete_extend

        q = LifoQueue()
        q.put(Trace())
        while not q.empty():
            partial = q.get()
            try:
                yield self._get_trace_pair(
                    model, guide, args, kwargs, rng_key, queue_trace=partial
                )
            except _SequentialEscape as escape:
                for extended in iter_discrete_extend(
                    escape.partial_trace, escape.site
                ):
                    q.put(extended)

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs) -> float:
        return self.differentiable_loss(
            model, guide, *args, rng_key=rng_key, **kwargs
        )

    def compute_marginals(self, model, guide, *args, rng_key=None, **kwargs):
        """Marginal posterior over each model-enumerated site
        (ref ``traceenum_elbo.py:224``)."""
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        model_trace, guide_trace = self._get_trace_pair(
            model, guide, args, kwargs, rng_key
        )
        return _compute_marginals(model_trace, guide_trace)


def _compute_marginals(model_trace, guide_trace):
    """Ref ``traceenum_elbo.py:224``, but via the adjoint: ONE
    forward contraction of log Z plus one backward pass yields all
    sites' marginals simultaneously (``ops/einsum_adjoint.py`` —
    the autodiff form of the reference's ``ops/einsum/adjoint.py``
    message passing)."""
    from ..distributions.discrete import Bernoulli, Categorical
    from ..ops.einsum_adjoint import adjoint_marginals, marginal_of_dims

    if any(
        n["type"] == "markov_chain" and n["value"]
        for n in model_trace.nodes.values()
    ):
        raise NotImplementedError(
            "compute_marginals does not support vectorized_markov; "
            "use pyro.markov (unrolled) for marginals"
        )

    (
        marginal_costs,
        log_factors,
        ordering,
        sum_dims,
        scale,
    ) = _compute_model_factors(model_trace, guide_trace)

    _, marg_tree = adjoint_marginals(log_factors, sum_dims)
    # original factors and their gradient-marginals align positionally
    marg_of = {}
    for (t, terms), (t2, mterms) in zip(
        log_factors.items(), marg_tree.items()
    ):
        for term, mterm in zip(terms, mterms):
            marg_of[id(term)] = mterm

    marginal_dists = OrderedDict()
    for name, site in model_trace.nodes.items():
        if (
            site["type"] != "sample"
            or name in guide_trace.nodes
            or site["infer"].get("_enumerate_dim") is None
        ):
            continue
        enum_dim = site["infer"]["_enumerate_dim"]
        enum_symbol = site["infer"]["_enumerate_symbol"]
        joint = marg_of[id(site["packed"]["unscaled_log_prob"])]
        probs = marginal_of_dims(joint, {enum_symbol}, sum_dims)
        logits_packed = packed.PackedTensor(
            jnp.log(jnp.clip(probs.value, jnp.finfo(probs.value.dtype).tiny)),
            probs.dims,
        )
        logits = packed.unpack(logits_packed, model_trace.symbol_to_dim)
        # move the enum dim to the rightmost position
        logits = jnp.moveaxis(logits, enum_dim, -1)
        while logits.ndim and logits.shape[0] == 1:
            logits = logits[0]
        logits = logits - jax.scipy.special.logsumexp(
            logits, axis=-1, keepdims=True
        )
        fn = site["fn"]
        if isinstance(fn, Bernoulli) or (
            hasattr(fn, "base_dist") and isinstance(getattr(fn, "base_dist", None), Bernoulli)
        ):
            marginal_dists[name] = Bernoulli(
                logits=logits[..., 1] - logits[..., 0]
            )
        else:
            marginal_dists[name] = Categorical(logits=logits)
    return marginal_dists


class JitTraceEnum_ELBO(TraceEnum_ELBO):
    """API parity alias (always jit-compiled via SVI)."""
