"""Exhaustive-enumeration posterior (ref ``pyro/contrib/oed/search.py:14``,
itself a port of the classic Search from the Pyro tutorials)."""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ... import poutine
from ...poutine.util import prune_subsample_sites


class Search:
    """Enumerate all discrete execution paths of a model via the escape/
    queue mechanism and return weighted traces."""

    def __init__(self, model, max_tries: int = 1_000_000):
        self.model = model
        self.max_tries = max_tries

    def run(self, *args, **kwargs):
        from collections import deque

        from ...poutine.handlers import EscapeMessenger
        from ...poutine.runtime import NonlocalExit
        from ...poutine.util import all_escape, discrete_escape, enum_extend
        from ...poutine.trace_struct import Trace

        queue = deque([Trace()])
        traces = []
        tries = 0
        while queue and tries < self.max_tries:
            tries += 1
            partial = queue.popleft()

            def escape_fn(msg, partial=partial):
                return discrete_escape(partial, msg)

            replayed = poutine.replay(
                poutine.seed(self.model, rng_key=jax.random.key(0)),
                trace=partial,
            )
            try:
                # the outer block hides this enumeration's sites from any
                # ENCLOSING handlers (nested Search inside another model's
                # trace, e.g. recursive RSA marginals) while the inner
                # trace/escape messengers still see them
                with poutine.block():
                    with poutine.handlers.TraceMessenger() as tm:
                        with EscapeMessenger(escape_fn):
                            ret = replayed(*args, **kwargs)
                full = tm.get_trace()
                # record the model's return value (the reference trace
                # always carries a _RETURN node; HashingMarginal reads it)
                full.nodes["_RETURN"] = {
                    "type": "return",
                    "name": "_RETURN",
                    "value": ret,
                }
                traces.append(full)
            except NonlocalExit as site_container:
                msg = site_container.site
                for tr in enum_extend(partial, msg):
                    queue.append(tr)
        # weight traces by their joint density
        log_ws = []
        for tr in traces:
            tr2 = prune_subsample_sites(tr)
            tr2.compute_log_prob()
            log_ws.append(tr2.log_prob_sum())
        return traces, jnp.stack(log_ws) if log_ws else jnp.zeros((0,))
