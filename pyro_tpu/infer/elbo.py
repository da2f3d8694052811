"""ELBO base class and Trace_ELBO.

Ref ``pyro/infer/elbo.py:28`` and ``pyro/infer/trace_elbo.py:32``.

TPU-native design: the reference's ``loss_and_grads`` calls
``surrogate.backward()``; here every ELBO exposes ``differentiable_loss``
as a *pure function* of (rng_key, args) given the surrounding param
handlers, and SVI wraps it in ``jax.value_and_grad`` + ``jit``.  Particle
vectorization (P2 in SURVEY §2.8) uses an outer plate so the whole
num_particles batch is one XLA program; the Python particle loop exists
only as a fallback for models with particle-dependent structure.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .. import poutine
from ..distributions.util import is_identically_zero
from ..poutine.plate_messenger import PlateMessenger
from .enum import get_importance_trace
from .util import MultiFrameTensor, get_plate_stacks, is_validation_enabled


class ELBO:
    """Ref ``elbo.py:28``."""

    def __init__(
        self,
        num_particles: int = 1,
        max_plate_nesting: float = float("inf"),
        max_iarange_nesting=None,
        vectorize_particles: bool = True,
        strict_enumeration_warning: bool = True,
        ignore_jit_warnings: bool = False,
        jit_options=None,
        retain_graph=None,
        tail_adaptive_beta: float = -1.0,
    ):
        if max_iarange_nesting is not None:
            max_plate_nesting = max_iarange_nesting
        self.num_particles = num_particles
        self.max_plate_nesting = max_plate_nesting
        self.vectorize_particles = vectorize_particles
        self.strict_enumeration_warning = strict_enumeration_warning
        # the particle plate occupies one extra nesting level
        # (ref ``elbo.py:128-131``)
        if (
            self.vectorize_particles
            and self.num_particles > 1
            and self.max_plate_nesting != float("inf")
        ):
            self.max_plate_nesting += 1

    def _guess_max_plate_nesting(self, model, guide, args, kwargs):
        """Ref ``elbo.py:144``: run once eagerly and inspect plate dims."""
        key = jax.random.key(0)
        with poutine.block():
            guide_trace = poutine.trace(
                poutine.seed(rng_key=key)(guide)
            ).get_trace(*args, **kwargs)
            model_trace = poutine.trace(
                poutine.seed(rng_key=key)(
                    poutine.replay(model, trace=guide_trace)
                )
            ).get_trace(*args, **kwargs)
        dims = [
            f.dim
            for tr in (model_trace, guide_trace)
            for site in tr.nodes.values()
            if site["type"] == "sample"
            for f in site["cond_indep_stack"]
            if f.dim is not None
        ]
        self.max_plate_nesting = -min(dims) if dims else 0
        if self.vectorize_particles and self.num_particles > 1:
            self.max_plate_nesting += 1

    def _vectorized_num_particles(self, fn):
        """Wrap fn in an outer particle plate (ref ``elbo.py:186``)."""

        def wrapped_fn(*args, **kwargs):
            if self.num_particles == 1:
                return fn(*args, **kwargs)
            with PlateMessenger(
                "num_particles_vectorized",
                self.num_particles,
                dim=-int(self.max_plate_nesting),
            ):
                return fn(*args, **kwargs)

        wrapped_fn._pyro_unwrapped = fn  # for GuideMessenger dispatch
        return wrapped_fn

    def _setup(self, model, guide, args, kwargs):
        if self.max_plate_nesting == float("inf"):
            self._guess_max_plate_nesting(model, guide, args, kwargs)

    def _get_vectorized_traces(self, model, guide, args, kwargs, rng_key):
        model = self._vectorized_num_particles(model)
        guide = self._vectorized_num_particles(guide)
        return get_importance_trace(
            "flat", self.max_plate_nesting, model, guide, args, kwargs,
            rng_key=rng_key,
        )

    def _get_traces(self, model, guide, args, kwargs, rng_key):
        """Yield (model_trace, guide_trace) per particle
        (ref ``elbo.py:226``)."""
        if self.vectorize_particles:
            yield self._get_vectorized_traces(
                model, guide, args, kwargs, rng_key
            )
        else:
            keys = (
                jax.random.split(rng_key, self.num_particles)
                if self.num_particles > 1
                else [rng_key]
            )
            for key in keys:
                yield get_importance_trace(
                    "flat",
                    self.max_plate_nesting,
                    model,
                    guide,
                    args,
                    kwargs,
                    rng_key=key,
                )


def _compute_log_r(model_trace, guide_trace) -> MultiFrameTensor:
    """Ref ``trace_elbo.py:20-31``."""
    log_r = MultiFrameTensor()
    stacks = get_plate_stacks(model_trace)
    for name, model_site in model_trace.nodes.items():
        if model_site["type"] == "sample":
            log_r_term = model_site["log_prob"]
            if not model_site["is_observed"]:
                log_r_term = log_r_term - guide_trace.nodes[name]["log_prob"]
            log_r.add(
                (model_site["cond_indep_stack"], jax.lax.stop_gradient(log_r_term))
            )
    return log_r


class Trace_ELBO(ELBO):
    """Monte Carlo ELBO with partial Rao-Blackwellization.

    Ref ``trace_elbo.py:32``: surrogate = Σ model log p − Σ guide entropy
    terms + Σ stop_grad(log_r)·score_function for non-reparameterized guide
    sites.
    """

    def _differentiable_loss_particle(self, model_trace, guide_trace):
        elbo_particle = 0.0
        surrogate_elbo_particle = 0.0
        log_r = None

        for name, model_site in model_trace.nodes.items():
            if model_site["type"] == "sample":
                if model_site["infer"].get("_do_not_score"):
                    continue
                lp_sum = model_site["log_prob_sum"]
                elbo_particle = elbo_particle + lp_sum
                surrogate_elbo_particle = surrogate_elbo_particle + lp_sum

        for name, guide_site in guide_trace.nodes.items():
            if guide_site["type"] == "sample":
                if guide_site["infer"].get("_do_not_score"):
                    continue
                log_prob, score_function_term, entropy_term = guide_site[
                    "score_parts"
                ]
                elbo_particle = elbo_particle - guide_site["log_prob_sum"]

                if not is_identically_zero(entropy_term):
                    surrogate_elbo_particle = (
                        surrogate_elbo_particle - jnp.sum(entropy_term)
                    )
                if not is_identically_zero(score_function_term):
                    if log_r is None:
                        log_r = _compute_log_r(model_trace, guide_trace)
                    site_r = log_r.sum_to(guide_site["cond_indep_stack"])
                    surrogate_elbo_particle = surrogate_elbo_particle + jnp.sum(
                        site_r * score_function_term
                    )

        return -elbo_particle, -surrogate_elbo_particle

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        """Pure, jit-able surrogate loss whose gradient equals the gradient
        of -ELBO (ref ``trace_elbo.py:115``)."""
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        loss = 0.0
        surrogate = 0.0
        for model_trace, guide_trace in self._get_traces(
            model, guide, args, kwargs, rng_key
        ):
            lp, sp = self._differentiable_loss_particle(
                model_trace, guide_trace
            )
            loss = loss + lp / self.num_particles
            surrogate = surrogate + sp / self.num_particles
        # return surrogate but report loss value through stop-grad algebra:
        # value(surrogate') = value(loss); grad(surrogate') = grad(surrogate)
        return surrogate + jax.lax.stop_gradient(loss - surrogate)

    def loss(self, model, guide, *args, rng_key=None, **kwargs) -> float:
        """Estimate of -ELBO as a python float (ref ``trace_elbo.py:66``)."""
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        loss = 0.0
        for model_trace, guide_trace in self._get_traces(
            model, guide, args, kwargs, rng_key
        ):
            lp, _ = self._differentiable_loss_particle(
                model_trace, guide_trace
            )
            loss = loss + lp / self.num_particles
        return loss

    # reference-parity alias: in Pyro this also runs backward(); here the
    # gradient is taken by the caller (SVI) via jax.grad.
    loss_and_grads = differentiable_loss


class TraceMeanField_ELBO(Trace_ELBO):
    """Use analytic KL(q||p) where available (ref
    ``trace_mean_field_elbo.py:49``)."""

    def _differentiable_loss_particle(self, model_trace, guide_trace):
        from ..distributions.kl import kl_divergence
        from ..distributions.util import scale_and_mask

        elbo_particle = 0.0
        for name, model_site in model_trace.nodes.items():
            if model_site["type"] != "sample":
                continue
            if model_site["infer"].get("_do_not_score"):
                continue
            if model_site["is_observed"]:
                elbo_particle = elbo_particle + model_site["log_prob_sum"]
            else:
                guide_site = guide_trace.nodes[name]
                try:
                    kl = kl_divergence(guide_site["fn"], model_site["fn"])
                    kl = scale_and_mask(
                        kl, guide_site["scale"], guide_site["mask"]
                    )
                    elbo_particle = elbo_particle - jnp.sum(kl)
                except NotImplementedError:
                    from .util import check_fully_reparametrized

                    check_fully_reparametrized(guide_site)
                    elbo_particle = (
                        elbo_particle
                        + model_site["log_prob_sum"]
                        - guide_site["log_prob_sum"]
                    )
        loss = -elbo_particle
        return loss, loss


class JitTrace_ELBO(Trace_ELBO):
    """API-parity alias (ref ``trace_elbo.py:162``): under this framework
    SVI always jit-compiles the loss, so Jit* variants equal their base."""
