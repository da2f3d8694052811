"""Legacy posterior-as-traces abstraction.

Ref ``pyro/infer/abstract_infer.py``: ``TracePosterior:184``,
``EmpiricalMarginal:17``, ``Marginals:116``.  A ``TracePosterior`` holds
weighted execution traces; ``marginal`` builds ``Empirical``
distributions over site values.  Retained for API parity — new code
should prefer :class:`~pyro_tpu.infer.predictive.Predictive`.
"""

from __future__ import annotations

from abc import ABCMeta, abstractmethod

import jax.numpy as jnp
from jax.scipy.special import logsumexp

from .. import poutine
from ..distributions.extra import Empirical
from ..ops.stats import waic


class TracePosterior(metaclass=ABCMeta):
    """Ref ``abstract_infer.py:184``."""

    def __init__(self, num_chains: int = 1):
        self.num_chains = num_chains
        self._reset()

    def _reset(self):
        self.log_weights = []
        self.exec_traces = []
        self.chain_ids = []
        self._idx_by_chain = [[] for _ in range(self.num_chains)]

    @abstractmethod
    def _traces(self, *args, **kwargs):
        """Yield (trace, log_weight) or (trace, log_weight, chain_id)."""
        raise NotImplementedError

    def __call__(self, *args, **kwargs):
        import numpy as np

        random_idx = int(
            np.random.default_rng().integers(len(self.exec_traces))
        )
        trace = self.exec_traces[random_idx].copy()
        for name, site in list(trace.nodes.items()):
            if site["type"] == "sample" and site["is_observed"]:
                del trace.nodes[name]
        return trace

    def run(self, *args, **kwargs):
        """Populate execution traces (ref :241-260).

        The trace loop runs under an argless ``poutine.block()`` so that
        sites sampled while collecting posterior traces are hidden from
        any handlers enclosing this call — essential for *nested*
        inference (e.g. RSA speaker/listener marginals), where an outer
        search's escape/trace messengers must not observe the inner
        search's sites, and ``NonlocalExit.reset_stack`` must stop
        unwinding at this block boundary.
        """
        from .. import poutine

        self._reset()
        with poutine.block():
            yielded = list(self._traces(*args, **kwargs))
        for vals in yielded:
            if len(vals) == 2:
                chain_id = 0
                tr, logit = vals
            else:
                tr, logit, chain_id = vals
                assert chain_id < self.num_chains
            self.exec_traces.append(tr)
            self.log_weights.append(logit)
            self.chain_ids.append(chain_id)
            self._idx_by_chain[chain_id].append(len(self.exec_traces) - 1)
        self._args, self._kwargs = args, kwargs
        return self

    def marginal(self, sites=None):
        """Marginal distribution over ``sites`` (ref :205)."""
        return Marginals(self, sites)

    def information_criterion(self, pointwise=False):
        """WAIC from observed-site log-likelihoods (ref :265)."""
        if not self.exec_traces:
            return {}
        obs_node = None
        log_likelihoods = []
        for tr in self.exec_traces:
            obs_nodes = tr.observation_nodes()
            if len(obs_nodes) > 1:
                raise ValueError(
                    "Infomation criterion calculation only works for models "
                    "with one observation node."
                )
            if obs_node is None:
                obs_node = obs_nodes[0]
            elif obs_node != obs_nodes[0]:
                raise ValueError(
                    "Observation node has been changed, expected {} but got {}".format(
                        obs_node, obs_nodes[0]
                    )
                )
            log_likelihoods.append(
                tr.nodes[obs_node]["fn"].log_prob(
                    tr.nodes[obs_node]["value"]
                )
            )
        ll = jnp.stack(log_likelihoods, 0)
        waic_value, p_waic = waic(
            ll, jnp.asarray(self.log_weights), pointwise
        )
        return {"waic": waic_value, "p_waic": p_waic}


class EmpiricalMarginal(Empirical):
    """Empirical marginal over one site (or several same-shape sites) of a
    TracePosterior (ref ``abstract_infer.py:17``)."""

    def __init__(self, trace_posterior, sites=None):
        if sites is None:
            sites = "_RETURN"
        if isinstance(sites, str):
            sites = [sites]
        # vectorized posteriors (e.g. infer.Importance) carry stacked
        # sample arrays instead of per-trace objects — use them directly.
        if hasattr(trace_posterior, "get_samples") and not isinstance(
            trace_posterior, TracePosterior
        ):
            stacked = trace_posterior.get_samples()
            samples = jnp.concatenate(
                [jnp.asarray(stacked[s]) for s in sites], 0
            )
            lw = jnp.asarray(
                trace_posterior.log_weights, jnp.result_type(float)
            )
            weights = jnp.concatenate([lw for _ in sites], 0)
            super().__init__(samples, weights)
            return
        assert isinstance(trace_posterior, TracePosterior)
        samples = []
        weights = []
        for tr, lw in zip(
            trace_posterior.exec_traces, trace_posterior.log_weights
        ):
            for site in sites:
                samples.append(jnp.asarray(tr.nodes[site]["value"]))
                weights.append(jnp.asarray(lw, jnp.result_type(float)))
        super().__init__(jnp.stack(samples, 0), jnp.stack(weights, 0))


class Marginals:
    """Dict of EmpiricalMarginals over latent sites (ref
    ``abstract_infer.py:116``)."""

    def __init__(self, trace_posterior, sites=None):
        assert isinstance(trace_posterior, TracePosterior)
        if sites is None:
            sites = ["_RETURN"]
        elif isinstance(sites, str):
            sites = [sites]
        self.sites = sites
        self.trace_posterior = trace_posterior
        self._marginals = {
            site: EmpiricalMarginal(trace_posterior, site)
            for site in sites
        }

    @property
    def empirical(self):
        return self._marginals

    def support(self, flatten=False):
        support = {
            site: m._samples for site, m in self._marginals.items()
        }
        return support


class TracePredictive(TracePosterior):
    """Posterior-predictive traces by resampling a TracePosterior and
    re-running the model forward (ref ``abstract_infer.py:313``).
    Deprecated in the reference in favor of Predictive — same here."""

    def __init__(self, model, posterior, num_samples, keep_sites=None):
        self.model = model
        self.posterior = posterior
        self.num_samples = num_samples
        self.keep_sites = keep_sites
        super().__init__()

    def _traces(self, *args, **kwargs):
        import jax

        if not self.posterior.exec_traces:
            self.posterior.run(*args, **kwargs)
        lw = jnp.asarray(self.posterior.log_weights, jnp.result_type(float))
        probs = jnp.exp(lw - logsumexp(lw))
        key = kwargs.pop("rng_key", None) or jax.random.key(0)
        idxs = jax.random.choice(
            key,
            len(self.posterior.exec_traces),
            (self.num_samples,),
            p=probs,
        )
        for i, idx in enumerate(idxs.tolist()):
            data_trace = self.posterior.exec_traces[idx]
            resampled = poutine.trace(
                poutine.seed(
                    poutine.replay(self.model, trace=data_trace),
                    jax.random.fold_in(key, i),
                )
            ).get_trace(*args, **kwargs)
            yield resampled, jnp.asarray(0.0)
