"""Importance resampler for interactive prior tuning.

Ref ``pyro/infer/resampler.py:14``: cache a large set of draws from a
diffuse ``guide`` (optionally extended through an expensive ``simulator``),
then cheaply importance-resample them under slightly different ``model``
priors — the prior-predictive-check workflow.

TPU-native: the guide/simulator draws are one ``vmap``-compiled program
over a batch of PRNG keys (no outer plate or max_plate_nesting guessing),
and scoring a new model over all cached draws is a second vmapped program.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from .. import poutine


def _trace_logp(trace) -> jnp.ndarray:
    """Sum of log-probs over ALL sample sites (observed ones included —
    :meth:`Resampler.sample` scores via ``poutine.condition``, which marks
    the cached draws observed)."""
    trace.compute_log_prob()
    total = 0.0
    for site in trace.nodes.values():
        if site["type"] == "sample":
            total = total + jnp.sum(site["log_prob"])
    return total


def _trace_samples(trace) -> Dict[str, jnp.ndarray]:
    return {
        name: site["value"]
        for name, site in trace.nodes.items()
        if site["type"] == "sample"
        and not site.get("is_observed", False)
        and not name.startswith("_")
    }


class Resampler:
    """Ref ``resampler.py:14``.

    :param callable guide: a diffuse model taking no arguments, covering
        more space than the models later passed to :meth:`sample`.
    :param callable simulator: optional extended model with a superset of
        the guide's latent variables.
    :param int num_guide_samples: cache size; should be much larger than
        the ``num_samples`` of subsequent :meth:`sample` calls.
    :param int max_plate_nesting: accepted for reference API parity;
        unused (vectorization is via ``vmap``, not an outer plate).
    """

    def __init__(
        self,
        guide: Callable,
        simulator: Optional[Callable] = None,
        *,
        num_guide_samples: int,
        max_plate_nesting: Optional[int] = None,
        rng_key=None,
    ):
        key = jax.random.key(0) if rng_key is None else rng_key

        def draw(k):
            k_guide, k_sim = jax.random.split(k)
            guide_trace = poutine.trace(
                poutine.seed(guide, rng_key=k_guide)
            ).get_trace()
            logp = _trace_logp(guide_trace)
            trace = guide_trace
            if simulator is not None:
                trace = poutine.trace(
                    poutine.seed(
                        poutine.replay(simulator, trace=guide_trace),
                        rng_key=k_sim,
                    )
                ).get_trace()
            return _trace_samples(trace), logp

        keys = jax.random.split(key, num_guide_samples)
        self._samples, self._old_logp = jax.jit(jax.vmap(draw))(keys)
        self._num_guide_samples = num_guide_samples

    def sample(
        self,
        model: Callable,
        num_samples: int,
        stable: bool = True,
        rng_key=None,
    ) -> Dict[str, jnp.ndarray]:
        """Importance-resample at most ``num_samples`` cached draws under
        ``model``'s density (ref ``resampler.py:69``)."""
        key = jax.random.key(1) if rng_key is None else rng_key

        def score(sample_slice, k):
            trace = poutine.trace(
                poutine.seed(
                    poutine.condition(model, data=sample_slice), rng_key=k
                )
            ).get_trace()
            return _trace_logp(trace)

        keys = jax.random.split(key, self._num_guide_samples)
        new_logp = jax.jit(jax.vmap(score))(self._samples, keys)
        logits = new_logp - self._old_logp
        i = self._categorical_sample(
            logits, num_samples, stable, jax.random.fold_in(key, 7)
        )
        return {k: v[i] for k, v in self._samples.items()}

    @staticmethod
    def _categorical_sample(logits, num_samples, stable, key):
        if not stable:
            return jax.random.categorical(key, logits, shape=(num_samples,))
        # piecewise-constant (Gumbel-max) resampling: small logit tweaks
        # keep most chosen indices fixed (ref ``resampler.py:100``)
        gumbels = jax.random.gumbel(key, (num_samples, logits.shape[-1]))
        return jnp.argmax(gumbels + logits, axis=-1)
