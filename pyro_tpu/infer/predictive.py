"""Posterior-predictive sampling.

Ref ``pyro/infer/predictive.py:162`` (Predictive), ``:79`` (_predictive),
``:338`` (WeighedPredictive), ``:459`` (MHResampler).

TPU-native: vectorization uses ``vmap`` over sample keys + replayed
posterior draws instead of an outer plate wrapping the model — no
max_plate_nesting guessing needed, and the whole predictive pass is one
compiled program.
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

from .. import poutine
from ..poutine.util import prune_subsample_sites, site_is_subsample


class Predictive:
    """Ref ``predictive.py:162``."""

    def __init__(
        self,
        model,
        posterior_samples: Optional[Dict] = None,
        guide=None,
        num_samples: Optional[int] = None,
        return_sites: Sequence[str] = (),
        parallel: bool = True,
    ):
        if posterior_samples is None and num_samples is None:
            raise ValueError(
                "either posterior_samples or num_samples must be given"
            )
        if posterior_samples is not None:
            batch_size = jax.tree.leaves(posterior_samples)[0].shape[0]
            if num_samples is None:
                num_samples = batch_size
            elif num_samples != batch_size:
                raise ValueError(
                    f"num_samples={num_samples} disagrees with leading dim "
                    f"{batch_size} of posterior_samples"
                )
        self.model = model
        self.posterior_samples = posterior_samples or {}
        self.guide = guide
        self.num_samples = num_samples
        self.return_sites = tuple(return_sites)
        self.parallel = parallel

    def _single_draw(self, key, sample_slice):
        key_guide, key_model = jax.random.split(key)
        model = self.model
        if self.guide is not None:
            guide_trace = poutine.trace(
                poutine.seed(self.guide, rng_key=key_guide)
            ).get_trace(*self._args, **self._kwargs)
            model = poutine.replay(model, trace=guide_trace)
        model = poutine.condition(model, data=sample_slice)
        tr = poutine.trace(
            poutine.seed(model, rng_key=key_model)
        ).get_trace(*self._args, **self._kwargs)
        out = {}
        for name, site in tr.nodes.items():
            if site["type"] != "sample" or site_is_subsample(site):
                continue
            if self.return_sites:
                if name in self.return_sites:
                    out[name] = site["value"]
            else:
                # default (ref predictive.py:120): every sample site not
                # supplied via posterior_samples
                if name not in self.posterior_samples:
                    out[name] = site["value"]
        return out

    def __call__(self, *args, rng_key=None, **kwargs):
        return self.get_samples(*args, rng_key=rng_key, **kwargs)

    def get_samples(self, *args, rng_key=None, **kwargs):
        if rng_key is None:
            rng_key = jax.random.key(11)
        self._args, self._kwargs = args, kwargs
        keys = jax.random.split(rng_key, self.num_samples)
        if self.parallel:
            fn = jax.jit(jax.vmap(self._single_draw))
            return fn(keys, self.posterior_samples)
        outs = [
            self._single_draw(
                keys[i],
                {k: v[i] for k, v in self.posterior_samples.items()},
            )
            for i in range(self.num_samples)
        ]
        return {
            k: jnp.stack([o[k] for o in outs]) for k in outs[0]
        }


class WeighedPredictiveResults(NamedTuple):
    samples: Dict
    log_weights: jnp.ndarray
    guide_log_prob: jnp.ndarray
    model_log_prob: jnp.ndarray


class WeighedPredictive(Predictive):
    """Predictive + per-sample importance log-weights
    (ref ``predictive.py:338``)."""

    def _single_weighed_draw(self, key, sample_slice):
        key_guide, key_model = jax.random.split(key)
        guide_trace = poutine.trace(
            poutine.seed(self.guide, rng_key=key_guide)
        ).get_trace(*self._args, **self._kwargs)
        guide_trace_p = prune_subsample_sites(guide_trace)
        guide_trace_p.compute_log_prob()
        guide_lp = guide_trace_p.log_prob_sum()
        model = poutine.replay(self.model, trace=guide_trace)
        tr = poutine.trace(
            poutine.seed(model, rng_key=key_model)
        ).get_trace(*self._args, **self._kwargs)
        tr_p = prune_subsample_sites(tr)
        tr_p.compute_log_prob()
        model_lp = tr_p.log_prob_sum(
            site_filter=lambda name, site: not site["infer"].get(
                "_deterministic"
            )
        )
        out = {}
        for name, site in tr.nodes.items():
            if site["type"] != "sample" or site_is_subsample(site):
                continue
            if self.return_sites:
                if name in self.return_sites:
                    out[name] = site["value"]
            elif not site["is_observed"]:
                out[name] = site["value"]
        return out, model_lp - guide_lp, guide_lp, model_lp

    def get_samples(self, *args, rng_key=None, **kwargs):
        if self.guide is None:
            raise ValueError("WeighedPredictive requires a guide")
        if rng_key is None:
            rng_key = jax.random.key(11)
        self._args, self._kwargs = args, kwargs
        keys = jax.random.split(rng_key, self.num_samples)
        fn = jax.jit(jax.vmap(lambda k: self._single_weighed_draw(k, None)))
        samples, log_w, guide_lp, model_lp = fn(keys)
        return WeighedPredictiveResults(samples, log_w, guide_lp, model_lp)


class MHResampler:
    """Metropolis-Hastings resampling of weighed samples to correct an
    approximate posterior (ref ``predictive.py:459``)."""

    def __init__(self, sampler: WeighedPredictive, source_samples_slice=slice(0), stored_samples_slice=slice(0)):
        self.sampler = sampler
        self._current: Optional[WeighedPredictiveResults] = None
        self._key = jax.random.key(17)

    def __call__(self, *args, **kwargs) -> WeighedPredictiveResults:
        # the sampler MUST propose fresh draws each round: with the
        # fixed default key every call would redraw the same batch and
        # the resampler would silently never move (the reference's
        # stateful torch RNG advances implicitly; here we advance our
        # own key when the caller doesn't supply one)
        if kwargs.get("rng_key") is None:
            self._key, sub = jax.random.split(self._key)
            kwargs["rng_key"] = sub
        new = self.sampler.get_samples(*args, **kwargs)
        if self._current is None:
            self._current = new
            return new
        self._key, sub = jax.random.split(self._key)
        u = jax.random.uniform(sub, new.log_weights.shape)
        accept = jnp.log(u) < (new.log_weights - self._current.log_weights)

        def pick(n, c):
            acc = accept.reshape(accept.shape + (1,) * (n.ndim - 1))
            return jnp.where(acc, n, c)

        merged = WeighedPredictiveResults(
            jax.tree.map(pick, new.samples, self._current.samples),
            jnp.where(accept, new.log_weights, self._current.log_weights),
            jnp.where(accept, new.guide_log_prob, self._current.guide_log_prob),
            jnp.where(accept, new.model_log_prob, self._current.model_log_prob),
        )
        self._current = merged
        return merged
