"""Inference utilities (ref ``pyro/infer/util.py``)."""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..distributions.util import is_identically_zero
from ..poutine.util import site_is_subsample


def is_validation_enabled() -> bool:
    from ..primitives import _VALIDATION_ENABLED

    return _VALIDATION_ENABLED


def torch_item(x):
    """Scalar extraction (named for API parity; works on jax arrays)."""
    return x if isinstance(x, (int, float)) else float(jax.device_get(x))


def zero_grads(params):
    """No-op under JAX's functional gradients; kept for API parity."""
    return params


class MultiFrameTensor(dict):
    """Accumulate log-prob tensors defined on different plate-frame sets and
    sum them down to a target frame set.

    Ref ``pyro/infer/util.py:122`` — used by TraceGraph_ELBO and the
    Rao-Blackwellized surrogate in Trace_ELBO: a downstream cost defined on
    frames F must be summed over dims not shared with the target site's
    frames before multiplying its score function.
    """

    def __init__(self, *items):
        super().__init__()
        self.add(*items)

    def add(self, *items) -> None:
        for cond_indep_stack, value in items:
            frames = frozenset(f for f in cond_indep_stack if f.dim is not None)
            if frames in self:
                self[frames] = self[frames] + value
            else:
                self[frames] = value

    def sum_to(self, target_frames):
        target_frames = frozenset(
            f for f in target_frames if f.dim is not None
        )
        total = None
        for frames, value in self.items():
            for f in frames - target_frames:
                if value.ndim >= -f.dim and value.shape[f.dim] != 1:
                    value = jnp.sum(value, axis=f.dim, keepdims=True)
            while value.ndim and value.shape[0] == 1:
                value = jnp.squeeze(value, axis=0)
            total = value if total is None else total + value
        return total


def get_plate_stacks(trace) -> Dict[str, List]:
    """Ref ``infer/util.py:get_plate_stacks``."""
    return {
        name: [f for f in node["cond_indep_stack"] if f.dim is not None]
        for name, node in trace.nodes.items()
        if node["type"] == "sample" and not site_is_subsample(node)
    }


def compute_site_dice_factor(site):
    """Per-site DiCE log factor + log normalizer (ref ``infer/util.py:174``).

    Only NON-reparameterized sites carry a score-function factor
    (``score_parts.score_function`` is identically zero for fully
    reparameterized sites — their gradients already flow pathwise through
    the cost terms, and adding a score factor double-counts, biasing the
    gradient; caught via a Beta-Bernoulli posterior landing at 0.20
    instead of the exact 0.105)."""
    import math

    from ..distributions.util import is_identically_zero
    from ..ops.packed import PackedTensor

    log_denom = 0.0
    score_function = site["packed"]["score_parts"].score_function
    if site["infer"].get("enumerate"):
        num_samples = site["infer"].get("num_samples")
        if num_samples is not None:  # TMC sampled enumeration
            # fold -log(num_samples) into the dice weight itself (NOT
            # log_denom): the weight rides downstream costs through the
            # contraction, so the enum-sample dim gets AVERAGED there;
            # log_denom only corrects non-downstream double counting
            # (ref ``infer/util.py:180-188``; caught by
            # test_non_mean_field_bern_normal_elbo_gradient[parallel-2]
            # reporting exactly 2x gradients at num_samples=2).
            log_prob = site["packed"]["log_prob"]
            if not is_identically_zero(score_function):
                log_prob = PackedTensor(
                    score_function.value
                    - jax.lax.stop_gradient(score_function.value)
                    - math.log(num_samples),
                    score_function.dims,
                )
            else:
                log_prob = PackedTensor(
                    jnp.full_like(log_prob.value, -math.log(num_samples)),
                    log_prob.dims,
                )
            return log_prob, 0.0
        elif site["infer"]["enumerate"] == "sequential":
            log_denom = math.log(
                site["infer"].get("_enum_total", 1)
            )
        # exhaustive enumeration: the dice factor is the exact
        # (undetached) probability weighting exp(log q) — discrete sites
        # are non-reparam, so score_function IS the packed log_prob
        log_prob = (
            site["packed"]["log_prob"]
            if is_identically_zero(score_function)
            else score_function
        )
        return log_prob, log_denom
    # monte carlo sampled
    if is_identically_zero(score_function):
        log_prob = PackedTensor(jnp.zeros(()), "")
    else:
        log_prob = PackedTensor(
            score_function.value
            - jax.lax.stop_gradient(score_function.value),
            score_function.dims,
        )
    return log_prob, log_denom


class Dice:
    """DiCE operator for plate-aware differentiable expectations.

    Ref ``pyro/infer/util.py:199``.  ``compute_expectation`` computes, for
    each cost tensor, the marginal probability of its dims under the product
    of dice factors via a direct log-einsum contraction (the reference uses
    an adjoint backward pass to share work across queries; here each query
    is one fused XLA contraction).
    """

    def __init__(self, guide_trace, ordering):
        from collections import defaultdict

        log_denoms: dict = defaultdict(float)
        log_probs: dict = defaultdict(list)
        for name, site in guide_trace.nodes.items():
            if site["type"] != "sample":
                continue
            if site["infer"].get("_do_not_score"):
                continue
            log_prob, log_denom = compute_site_dice_factor(site)
            ordinal = ordering[name]
            log_probs[ordinal].append(log_prob)
            if log_denom:
                log_denoms[ordinal] += log_denom
        self.log_denom = log_denoms
        self.log_probs = log_probs

    def _get_log_factors(self, target_ordinal):
        log_denom = 0.0
        for ordinal, term in self.log_denom.items():
            if not ordinal <= target_ordinal:
                log_denom += term
        log_factors = [] if log_denom == 0.0 else [-log_denom]
        for ordinal, terms in self.log_probs.items():
            if ordinal <= target_ordinal:
                log_factors.extend(terms)
        return log_factors

    def compute_expectation(self, costs):
        """Ref ``infer/util.py:264``."""
        import math

        from ..ops.packed import PackedTensor, broadcast_all
        from ..ops.rings import logsumexp_contract

        expected_cost = 0.0
        for ordinal, cost_terms in costs.items():
            log_factors = self._get_log_factors(ordinal)
            scale = math.exp(
                sum(x for x in log_factors if isinstance(x, float))
            )
            log_factors = [
                x for x in log_factors if isinstance(x, PackedTensor)
            ]
            factor_dims = set()
            for f in log_factors:
                factor_dims |= set(f.dims)

            # group cost terms by their dims-set; one contraction per group
            prob_cache = {}
            for cost in cost_terms:
                key = frozenset(cost.dims)
                if key not in prob_cache:
                    out_dims = "".join(sorted(key & factor_dims))
                    if log_factors:
                        sum_dims = factor_dims - set(out_dims)
                        log_marginal = logsumexp_contract(
                            list(log_factors), sum_dims
                        )
                        # keep only out_dims (other retained dims are
                        # ordinal plate dims shared with the cost)
                        extra = set(log_marginal.dims) - key
                        if extra:
                            from ..ops.rings import logsumexp_single

                            keep = "".join(
                                d
                                for d in log_marginal.dims
                                if d not in extra
                            )
                            log_marginal = logsumexp_single(
                                log_marginal, keep
                            )
                        prob = PackedTensor(
                            jnp.exp(log_marginal.value), log_marginal.dims
                        )
                    else:
                        prob = PackedTensor(jnp.ones(()), "")
                    prob_cache[key] = prob
                prob = prob_cache[key]
                c, p = broadcast_all(cost, prob)
                expected_cost = expected_cost + scale * jnp.sum(
                    c.value * p.value
                )
        return expected_cost


def check_fully_reparametrized(guide_site) -> None:
    from ..distributions.util import is_identically_zero

    log_prob, score_function_term, entropy_term = guide_site["score_parts"]
    fully_rep = is_identically_zero(score_function_term)
    if not fully_rep:
        raise NotImplementedError(
            "All distributions in the guide must be fully reparameterized "
            f"here, but site '{guide_site['name']}' is not."
        )
