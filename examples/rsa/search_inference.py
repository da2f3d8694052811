"""Exact search inference utilities for the RSA examples
(ref ``examples/rsa/search_inference.py``): ``HashingMarginal`` turns a
TracePosterior's return values into a histogram Distribution, and
``Search`` enumerates every discrete execution path via the escape/queue
machinery.  ``memoize`` caches the recursive agent marginals — the heart
of the rational-speech-acts recursion.
"""

from __future__ import annotations

import collections
import functools

import jax
import jax.numpy as jnp
import numpy as np

import pyro_tpu.distributions as dist
from pyro_tpu import poutine
from pyro_tpu.infer import TracePosterior


def memoize(fn=None, **kwargs):
    if fn is None:
        return lambda _fn: memoize(_fn, **kwargs)
    return functools.lru_cache(**kwargs)(fn)


class HashingMarginal(dist.Distribution):
    """Histogram distribution over the return values of a TracePosterior
    (ref ``search_inference.py:28``)."""

    has_enumerate_support = True

    def __init__(self, trace_dist, sites=None):
        assert isinstance(trace_dist, TracePosterior)
        if sites is None:
            sites = "_RETURN"
        assert isinstance(sites, (str, list))
        self.sites = sites
        self.trace_dist = trace_dist
        super().__init__()

    def _value_of(self, tr):
        if isinstance(self.sites, str):
            return tr.nodes[self.sites]["value"]
        return {site: tr.nodes[site]["value"] for site in self.sites}

    @staticmethod
    def _hash(value):
        if isinstance(value, dict):
            return hash(
                tuple(
                    (k, HashingMarginal._hash(value[k]))
                    for k in sorted(value)
                )
            )
        if hasattr(value, "tobytes"):
            return hash(np.asarray(value).tobytes())
        try:
            return hash(value)
        except TypeError:
            return hash(np.asarray(value).tobytes())

    @memoize(maxsize=10)
    def _dist_and_values(self):
        values_map = collections.OrderedDict()
        logits = collections.OrderedDict()
        for tr, logit in zip(
            self.trace_dist.exec_traces, self.trace_dist.log_weights
        ):
            value = self._value_of(tr)
            h = self._hash(value)
            logit = jnp.asarray(logit, jnp.result_type(float))
            if h in logits:
                logits[h] = jnp.logaddexp(logits[h], logit)
            else:
                logits[h] = logit
                values_map[h] = value
        logit_vec = jnp.stack(list(logits.values())).reshape(-1)
        logit_vec = logit_vec - jax.scipy.special.logsumexp(logit_vec)
        return dist.Categorical(logits=logit_vec), values_map

    def sample(self, key=None, sample_shape=()):
        if key is None:
            key = jax.random.key(np.random.randint(2**31))
        d, values_map = self._dist_and_values()
        ix = int(d.sample(key))
        return list(values_map.values())[ix]

    def __call__(self, key=None):
        return self.sample(key)

    def log_prob(self, val):
        d, values_map = self._dist_and_values()
        h = self._hash(val)
        idx = list(values_map.keys()).index(h)
        return d.log_prob(jnp.asarray(idx))

    def enumerate_support(self, expand=True):
        _, values_map = self._dist_and_values()
        return list(values_map.values())

    @property
    def probs(self):
        return self._dist_and_values()[0].probs


class Search(TracePosterior):
    """Exact inference by enumerating every discrete execution path
    (ref ``search_inference.py:138``), built on the contrib.oed Search
    engine (escape + enum_extend queue)."""

    def __init__(self, model, max_tries: int = 1_000_000):
        self.model = model
        self.max_tries = max_tries
        super().__init__()

    def _traces(self, *args, **kwargs):
        from pyro_tpu.contrib.oed.search import Search as _Engine

        traces, log_ws = _Engine(self.model, self.max_tries).run(
            *args, **kwargs
        )
        for tr, lw in zip(traces, log_ws):
            yield tr, lw


###############################################
# Best-first Search Inference (ref search_inference.py:161-223)
###############################################


def pqueue(fn, queue):
    """Expand partial traces in probability order (ref :161-196)."""
    import functools

    from pyro_tpu.poutine.runtime import NonlocalExit
    from pyro_tpu.poutine.util import enum_extend

    def sample_escape(tr, site):
        return (
            (site["name"] not in tr)
            and (site["type"] == "sample")
            and (not site["is_observed"])
        )

    def _fn(*args, **kwargs):
        for i in range(int(1e6)):
            assert not queue.empty(), (
                "trying to get() from an empty queue will deadlock"
            )
            priority, counter, next_trace = queue.get()
            try:
                ftr = poutine.trace(
                    poutine.escape(
                        poutine.replay(fn, trace=next_trace),
                        escape_fn=functools.partial(
                            sample_escape, next_trace
                        ),
                    )
                )
                return ftr(*args, **kwargs)
            except NonlocalExit as site_container:
                site_container.reset_stack()
                for tr in enum_extend(
                    ftr.trace.copy(), site_container.site
                ):
                    tr.compute_log_prob()
                    # subtract noise to break priority ties
                    queue.put(
                        (
                            -float(tr.log_prob_sum())
                            + float(np.random.rand()) * 1e-2,
                            next(_tiebreak),
                            tr,
                        )
                    )
        raise ValueError(f"max tries {1e6} exceeded")

    return _fn


_tiebreak = iter(range(10**9))


class BestFirstSearch(TracePosterior):
    """Enumerate executions in probability order (ref :200-223); exact
    (equivalent to Search) when all executions fit in num_samples."""

    def __init__(self, model, num_samples=None, **kwargs):
        self.num_samples = num_samples or 100
        self.model = model
        super().__init__()

    def _traces(self, *args, **kwargs):
        import queue as _queue

        from pyro_tpu.poutine.trace_struct import Trace

        q = _queue.PriorityQueue()
        q.put((0.0, next(_tiebreak), Trace()))
        q_fn = pqueue(self.model, queue=q)
        for i in range(self.num_samples):
            if q.empty():
                break  # num_samples was too large!
            tr = poutine.trace(q_fn).get_trace(*args, **kwargs)
            tr.compute_log_prob()
            yield tr, tr.log_prob_sum()
