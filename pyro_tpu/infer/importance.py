"""Importance sampling + PSIS diagnostic + RWS + CSIS.

Ref ``pyro/infer/importance.py:77`` (Importance, ``psis_diagnostic``),
``pyro/infer/rws.py:17`` (ReweightedWakeSleep), ``pyro/infer/csis.py:16``.
"""

from __future__ import annotations

import math
import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.scipy.special import logsumexp

from .. import poutine
from ..poutine.util import prune_subsample_sites
from .elbo import ELBO
from .enum import get_importance_trace


class Importance:
    """Importance sampling posterior approximation (ref
    ``importance.py:77``): vectorized over particles via vmap instead of the
    reference's Python loop."""

    def __init__(self, model, guide=None, num_samples: Optional[int] = None):
        self.model = model
        self.guide = guide
        self.num_samples = 10 if num_samples is None else num_samples
        self.log_weights = None
        self._samples = None

    def run(self, *args, rng_key=None, **kwargs):
        if rng_key is None:
            rng_key = jax.random.key(0)
        keys = jax.random.split(rng_key, self.num_samples)

        def draw(key):
            k_g, k_m = jax.random.split(key)
            if self.guide is not None:
                guide_trace = poutine.trace(
                    poutine.seed(self.guide, rng_key=k_g)
                ).get_trace(*args, **kwargs)
                guide_trace_p = prune_subsample_sites(guide_trace)
                guide_trace_p.compute_log_prob()
                guide_lp = guide_trace_p.log_prob_sum()
                model = poutine.replay(self.model, trace=guide_trace)
            else:
                guide_lp = 0.0
                model = self.model
            tr = poutine.trace(
                poutine.seed(model, rng_key=k_m)
            ).get_trace(*args, **kwargs)
            tr_p = prune_subsample_sites(tr)
            tr_p.compute_log_prob()
            model_lp = tr_p.log_prob_sum()
            latents = {
                name: site["value"]
                for name, site in tr_p.nodes.items()
                if site["type"] == "sample" and not site["is_observed"]
            }
            if "_RETURN" in tr.nodes:
                ret = tr.nodes["_RETURN"]["value"]
                if ret is not None:
                    latents["_RETURN"] = ret
            return latents, model_lp - guide_lp

        samples, log_w = jax.jit(jax.vmap(draw))(keys)
        self._samples = samples
        self.log_weights = log_w
        return self

    def get_samples(self):
        return self._samples

    def get_log_normalizer(self):
        return logsumexp(self.log_weights) - math.log(self.num_samples)

    def get_normalized_weights(self, log_scale: bool = False):
        lw = self.log_weights - logsumexp(self.log_weights)
        return lw if log_scale else jnp.exp(lw)

    def get_ESS(self):
        lw = self.get_normalized_weights(log_scale=True)
        return jnp.exp(-logsumexp(2 * lw))


def psis_diagnostic(model, guide, *args, num_particles: int = 1000, max_plate_nesting=None, rng_key=None, **kwargs) -> float:
    """PSIS k-hat (ref ``importance.py:160``; Yao et al. 2018): k < 0.5 good,
    0.5-0.7 usable, > 0.7 unreliable variational fit."""
    imp = Importance(model, guide, num_samples=num_particles).run(
        *args, rng_key=rng_key, **kwargs
    )
    log_w = np.asarray(jax.device_get(imp.log_weights))
    log_w = log_w - log_w.max()
    w = np.exp(np.sort(log_w))
    m = min(
        int(0.2 * num_particles), int(3 * math.sqrt(num_particles))
    )
    from ..ops.stats import fit_generalized_pareto

    tail = w[-m:]
    k, _ = fit_generalized_pareto(tail - w[-m - 1])
    return float(k)


def vectorized_importance_weights(model, guide, *args, num_samples=1, max_plate_nesting=None, rng_key=None, **kwargs):
    """Ref ``importance.py:vectorized_importance_weights``."""
    imp = Importance(model, guide, num_samples=num_samples).run(
        *args, rng_key=rng_key, **kwargs
    )
    return imp.log_weights, None, None


class ReweightedWakeSleep(ELBO):
    """Wake-theta / wake-phi losses (ref ``pyro/infer/rws.py:17``).

    Returns (model_loss, guide_loss); ``insomnia`` interpolates wake-phi
    (1.0) and sleep-phi (0.0).
    """

    def __init__(
        self,
        num_particles: int = 2,
        insomnia: float = 1.0,
        model_has_params: bool = True,
        num_sleep_particles: Optional[int] = None,
        vectorize_particles: bool = True,
        max_plate_nesting: float = float("inf"),
        strict_enumeration_warning: bool = True,
    ):
        super().__init__(
            num_particles=num_particles,
            max_plate_nesting=max_plate_nesting,
            vectorize_particles=False,
            strict_enumeration_warning=strict_enumeration_warning,
        )
        assert 0.0 <= insomnia <= 1.0
        self.insomnia = insomnia
        self.model_has_params = model_has_params
        self.num_sleep_particles = (
            num_particles if num_sleep_particles is None else num_sleep_particles
        )

    def _loss(self, model, guide, args, kwargs, rng_key):
        keys = jax.random.split(rng_key, self.num_particles)
        log_joints = []
        log_qs = []
        for key in keys:
            model_trace, guide_trace = get_importance_trace(
                "flat", self.max_plate_nesting, model, guide, args, kwargs,
                rng_key=key, detach=True,
            )
            log_joint = 0.0
            for site in model_trace.nodes.values():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    log_joint = log_joint + site["log_prob_sum"]
            log_q = 0.0
            for site in guide_trace.nodes.values():
                if site["type"] == "sample" and not site["infer"].get(
                    "_do_not_score"
                ):
                    log_q = log_q + site["log_prob_sum"]
            log_joints.append(log_joint)
            log_qs.append(log_q)
        log_joint = jnp.stack(log_joints)
        log_q = jnp.stack(log_qs)
        log_w = jax.lax.stop_gradient(log_q * 0) + log_joint - jax.lax.stop_gradient(log_q)
        normalized = jax.nn.softmax(jax.lax.stop_gradient(log_w))

        # wake-theta: -log (1/K sum w)
        wake_theta_loss = -(
            logsumexp(log_w, axis=0) - math.log(self.num_particles)
        )
        # wake-phi: -sum normalized_w * log q
        wake_phi_loss = -jnp.sum(normalized * log_q)

        if self.insomnia < 1.0:
            # sleep-phi: train q on model simulations
            key_sleep = jax.random.fold_in(rng_key, 7)
            sleep_loss = 0.0
            skeys = jax.random.split(key_sleep, self.num_sleep_particles)
            for skey in skeys:
                k1, k2 = jax.random.split(skey)
                unconditioned = poutine.uncondition(model)
                model_trace = poutine.trace(
                    poutine.seed(unconditioned, rng_key=k1)
                ).get_trace(*args, **kwargs)
                data = {
                    name: jax.lax.stop_gradient(site["value"])
                    for name, site in model_trace.nodes.items()
                    if site["type"] == "sample"
                }
                guide_replay = poutine.condition(guide, data=data)
                gt = poutine.trace(
                    poutine.seed(guide_replay, rng_key=k2)
                ).get_trace(*args, **kwargs)
                gt = prune_subsample_sites(gt)
                gt.compute_log_prob()
                sleep_loss = sleep_loss - gt.log_prob_sum()
            sleep_loss = sleep_loss / self.num_sleep_particles
            phi_loss = (
                self.insomnia * wake_phi_loss
                + (1.0 - self.insomnia) * sleep_loss
            )
        else:
            phi_loss = wake_phi_loss
        return wake_theta_loss, phi_loss

    def differentiable_loss(self, model, guide, *args, rng_key=None, **kwargs):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        theta_loss, phi_loss = self._loss(model, guide, args, kwargs, rng_key)
        return theta_loss + phi_loss

    loss_and_grads = differentiable_loss

    def loss(self, model, guide, *args, rng_key=None, **kwargs):
        self._setup(model, guide, args, kwargs)
        if rng_key is None:
            from ..poutine.runtime import _next_eager_key

            rng_key = _next_eager_key()
        theta, phi = self._loss(model, guide, args, kwargs, rng_key)
        return float(jax.device_get(theta)), float(jax.device_get(phi))


class CSIS(Importance):
    """Compiled sequential importance sampling (inference compilation):
    train the guide on prior simulations (ref ``pyro/infer/csis.py:16``)."""

    def __init__(
        self,
        model,
        guide,
        optim,
        num_inference_samples: int = 10,
        training_batch_size: int = 10,
        validation_batch_size: int = 20,
    ):
        super().__init__(model, guide, num_inference_samples)
        self.optim = optim
        self.training_batch_size = training_batch_size
        self.validation_batch_size = validation_batch_size
        self.validation_batch = None
        self._rng = jax.random.key(41)

    def _sample_joint_data(self, key, n, args, kwargs):
        """Prior simulations (ref ``csis.py:190`` ``_sample_from_joint``).
        Each element is a ``(latents, observations)`` pair of {site: value}
        dicts from one unconditioned model trace — ``uncondition`` marks
        previously-observed sites with ``infer["was_observed"]`` so their
        simulated values can be fed back to the guide as data."""
        batch = []
        for k in jax.random.split(key, n):
            with poutine.block():
                mt = poutine.trace(
                    poutine.seed(poutine.uncondition(self.model), rng_key=k)
                ).get_trace(*args, **kwargs)
            latents, observations = {}, {}
            for name, site in mt.nodes.items():
                if site["type"] != "sample":
                    continue
                if site["infer"].get("was_observed") or site["is_observed"]:
                    observations[name] = site["value"]
                else:
                    latents[name] = site["value"]
            batch.append((latents, observations))
        return batch

    def _guide_nll(self, params, key, batch, args, kwargs):
        """-mean_i log q(x_i | y_i) over matched guide traces: each guide
        run receives the simulation's observed values via the
        ``observations`` kwarg (inference-compilation training across
        simulated datasets) and is conditioned on the simulation's latents
        (ref ``csis.py:91`` ``loss_and_grads`` /
        ``:161`` ``_get_matched_trace``)."""
        from ..infer.svi import ParamsMessenger
        from ..params.param_store import get_param_store

        store = get_param_store()
        total = 0.0
        for k2, (latents, observations) in zip(
            jax.random.split(key, len(batch)), batch
        ):
            data = {
                name: jax.lax.stop_gradient(v)
                for name, v in latents.items()
            }
            run_kwargs = dict(kwargs)
            run_kwargs["observations"] = {
                name: jax.lax.stop_gradient(v)
                for name, v in observations.items()
            }
            with ParamsMessenger(params, store):
                gt = poutine.trace(
                    poutine.seed(
                        poutine.condition(self.guide, data=data),
                        rng_key=k2,
                    )
                ).get_trace(*args, **run_kwargs)
            gt = prune_subsample_sites(gt)
            self._check_matched_trace(gt, data)
            gt.compute_log_prob()
            total = total - gt.log_prob_sum()
        return total / len(batch)

    def _check_matched_trace(self, guide_trace, latents):
        """A guide that omits (or misnames) a model latent would be
        silently scored on fewer sites, training toward the wrong
        objective — raise instead (ref ``csis.py:161``
        ``_get_matched_trace`` via ``check_model_guide_match``).  Guide
        sample sites with no model counterpart are auxiliary
        randomness; warn once since they make the NLL an upper bound."""
        guide_sites = {
            name
            for name, node in guide_trace.nodes.items()
            if node["type"] == "sample"
        }
        missing = set(latents) - guide_sites
        if missing:
            raise RuntimeError(
                "CSIS guide is missing model latent sites "
                f"{sorted(missing)}; the guide must sample every "
                "latent the model does (matching names)."
            )
        extras = guide_sites - set(latents)
        if extras and not getattr(self, "_warned_aux_sites", False):
            self._warned_aux_sites = True
            warnings.warn(
                "CSIS guide has auxiliary sample sites "
                f"{sorted(extras)} not present in the model; they are "
                "scored as part of the guide NLL.",
                stacklevel=2,
            )

    def _init_params(self, key, args, kwargs):
        """Register guide params by tracing once without overrides."""
        k1, k2 = jax.random.split(key)
        latents, observations = self._sample_joint_data(k1, 1, args, kwargs)[0]
        run_kwargs = dict(kwargs)
        run_kwargs["observations"] = observations
        poutine.trace(
            poutine.seed(
                poutine.condition(self.guide, data=latents), rng_key=k2
            )
        ).get_trace(*args, **run_kwargs)

    def set_validation_batch(self, *args, **kwargs):
        """Draw and freeze ``validation_batch_size`` prior simulations
        (ref ``csis.py:57``)."""
        self._rng, key, self._validation_key = jax.random.split(
            self._rng, 3
        )
        self.validation_batch = self._sample_joint_data(
            key, self.validation_batch_size, args, kwargs
        )

    def validation_loss(self, *args, **kwargs) -> float:
        """Guide NLL on the frozen validation batch — deterministic given
        the batch, so consecutive calls agree until ``step`` moves the
        params (ref ``csis.py:145``)."""
        from ..infer.svi import _MissingParam
        from ..params.param_store import get_param_store

        if self.validation_batch is None:
            self.set_validation_batch(*args, **kwargs)
        store = get_param_store()
        # one rng frozen alongside the batch: model latents are all
        # conditioned, but any *auxiliary* guide sites draw from this
        # key, so the reported loss is a fixed quadrature point rather
        # than a key-0 resample every call
        key = self._validation_key
        try:
            params = store.get_all_unconstrained()
            loss = self._guide_nll(
                params, key, self.validation_batch, args, kwargs
            )
        except (_MissingParam, KeyError):
            self._rng, k_init = jax.random.split(self._rng)
            self._init_params(k_init, args, kwargs)
            params = store.get_all_unconstrained()
            loss = self._guide_nll(
                params, key, self.validation_batch, args, kwargs
            )
        return float(jax.device_get(loss))

    def step(self, *args, **kwargs) -> float:
        """One gradient step on -E_{p(x,y)}[log q(x|y)]
        (ref ``csis.py:step``)."""
        from ..params.param_store import get_param_store
        from ..infer.svi import _MissingParam

        self._rng, key = jax.random.split(self._rng)
        k_data, k_guide = jax.random.split(key)
        store = get_param_store()
        batch = self._sample_joint_data(
            k_data, self.training_batch_size, args, kwargs
        )

        def loss_fn(params):
            return self._guide_nll(params, k_guide, batch, args, kwargs)

        # eager init of guide params
        try:
            params = store.get_all_unconstrained()
            loss_val, grads = jax.value_and_grad(loss_fn)(params)
        except (_MissingParam, KeyError):
            self._rng, k_init = jax.random.split(self._rng)
            self._init_params(k_init, args, kwargs)
            params = store.get_all_unconstrained()
            loss_val, grads = jax.value_and_grad(loss_fn)(params)
        new_params = self.optim(params, grads)
        store.set_all_unconstrained(new_params)
        return float(jax.device_get(loss_val))
