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


def _site_dice_factor(site):
    """Per-site DiCE log-factor (ref ``infer/util.py:174``
    ``compute_site_dice_factor``): carries the score-function gradient for
    non-reparameterized proposals and, for multiply-sampled (TMC) sites,
    the ``-log K`` normalizer *broadcast to the site's packed dims* — so a
    site inside a plate contributes one ``1/K`` per plate slot, not one
    globally."""
    lp = site["packed"]["log_prob"]
    if site["fn"].has_rsample:
        base = jnp.zeros_like(lp.value)
    else:
        base = lp.value - jax.lax.stop_gradient(lp.value)
    num_samples = None
    if site["infer"].get("enumerate"):
        num_samples = site["infer"].get("num_samples")
    if num_samples is not None:
        return packed.PackedTensor(
            base - math.log(num_samples), lp.dims
        )
    if site["fn"].has_rsample:
        return None  # identically zero: no factor needed
    return packed.PackedTensor(base, lp.dims)


def _compute_tmc_estimate(model_trace, guide_trace):
    """log Ẑ via one contraction of log(p/q) factors plus per-site DiCE
    normalizer factors (ref ``tracetmc_elbo.py:26-73``)."""
    log_factors = OrderedDict()
    sum_dims = set()
    # +log p for every model site; prior-proposal latents also get -log p
    # (the proposal) and a DiCE normalizer factor
    for name, site in model_trace.nodes.items():
        if site["type"] != "sample" or site["infer"].get("_do_not_score"):
            continue
        ordinal = _find_ordinal(model_trace, site)
        lp = site["packed"]["log_prob"]
        if site["infer"].get("_enumerate_dim") is not None:
            sum_dims.add(site["infer"]["_enumerate_symbol"])
        log_factors.setdefault(ordinal, []).append(lp)
        if (
            name not in guide_trace.nodes
            and not site["is_observed"]
            and site["infer"].get("num_samples")
        ):
            # sampled from the prior as its own proposal: p/q cancels in
            # value; the dice factor carries 1/K and the score gradient
            log_factors[ordinal].append(packed.neg(lp))
            dice = _site_dice_factor(site)
            if dice is not None:
                log_factors[ordinal].append(dice)
    # -log q and a dice factor for every guide site
    for name, site in guide_trace.nodes.items():
        if site["type"] != "sample" or site["infer"].get("_do_not_score"):
            continue
        ordinal = _find_ordinal(guide_trace, site)
        log_factors.setdefault(ordinal, []).append(
            packed.neg(site["packed"]["log_prob"])
        )
        if site["infer"].get("_enumerate_dim") is not None:
            sum_dims.add(site["infer"]["_enumerate_symbol"])
        dice = _site_dice_factor(site)
        if dice is not None:
            log_factors[ordinal].append(dice)
    result = contract_to_tensor(log_factors, sum_dims)
    return result.value


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
