"""Tensor Monte Carlo ELBO (ref ``pyro/infer/tracetmc_elbo.py:105``;
Aitchison 2018): multi-sample 'enumeration' — each enumerated dim carries
``num_samples`` draws instead of the exhaustive support, and the estimate
is a tensor contraction over all sampled dims minus log(num_samples)
normalizers."""

from __future__ import annotations

import math
from collections import OrderedDict

import jax
import jax.numpy as jnp

from .. import poutine
from ..ops import packed
from ..ops.contract import contract_to_tensor
from ..ops.rings import LogRing
from ..poutine.enum_messenger import EnumMessenger
from ..poutine.util import prune_subsample_sites
from .elbo import ELBO
from .traceenum_elbo import _find_ordinal


def _compute_tmc_estimate(model_trace, guide_trace):
    """log Ẑ = contract over sampled dims of Π p / Π q  −  Σ log K
    (ref ``tracetmc_elbo.py:26``)."""
    log_factors = OrderedDict()
    sum_dims = set()
    log_denom = 0.0
    # +log p for every model site
    for name, site in model_trace.nodes.items():
        if site["type"] != "sample" or site["infer"].get("_do_not_score"):
            continue
        ordinal = _find_ordinal(model_trace, site)
        lp = site["packed"]["log_prob"]
        if site["infer"].get("_enumerate_dim") is not None:
            sum_dims.add(site["infer"]["_enumerate_symbol"])
            if name not in guide_trace.nodes and site["infer"].get(
                "num_samples"
            ):
                # sampled from the prior as its own proposal: p/q cancels
                # in value; keep the score-function gradient
                # (ref infer/util.py compute_site_dice_factor num_samples)
                log_denom += math.log(site["infer"]["num_samples"])
                lp = packed.PackedTensor(
                    lp.value - jax.lax.stop_gradient(lp.value), lp.dims
                )
        log_factors.setdefault(ordinal, []).append(lp)
    # -log q for every guide site
    for name, site in guide_trace.nodes.items():
        if site["type"] != "sample" or site["infer"].get("_do_not_score"):
            continue
        ordinal = _find_ordinal(guide_trace, site)
        log_factors.setdefault(ordinal, []).append(
            packed.neg(site["packed"]["log_prob"])
        )
        if site["infer"].get("_enumerate_dim") is not None:
            sum_dims.add(site["infer"]["_enumerate_symbol"])
            if site["infer"].get("num_samples"):
                log_denom += math.log(site["infer"]["num_samples"])
    result = contract_to_tensor(log_factors, sum_dims)
    return result.value - log_denom


class TraceTMC_ELBO(ELBO):
    """Ref ``tracetmc_elbo.py:105``."""

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        key_guide, key_model = jax.random.split(rng_key)
        first_dim = -1 - int(self.max_plate_nesting)
        guide_enum = EnumMessenger(first_available_dim=first_dim)(
            poutine.seed(guide, rng_key=key_guide)
        )
        guide_trace = poutine.trace(guide_enum).get_trace(*args, **kwargs)
        model_enum = EnumMessenger()(
            poutine.seed(
                poutine.replay(model, trace=guide_trace),
                rng_key=key_model,
            )
        )
        model_trace = poutine.trace(model_enum).get_trace(*args, **kwargs)
        guide_trace = prune_subsample_sites(guide_trace)
        model_trace = prune_subsample_sites(model_trace)
        model_trace.compute_log_prob()
        guide_trace.compute_log_prob()
        model_trace.pack_tensors()
        guide_trace.pack_tensors(model_trace.plate_to_symbol)
        elbo = _compute_tmc_estimate(model_trace, guide_trace)
        return -elbo

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs):
        return float(
            jax.device_get(
                self.differentiable_loss(
                    model, guide, *args, rng_key=rng_key, **kwargs
                )
            )
        )
