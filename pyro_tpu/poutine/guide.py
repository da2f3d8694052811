"""Effect-based guide base class (ref ``pyro/poutine/guide.py:19``).

A ``GuideMessenger`` runs *inside* the model: it intercepts each latent
sample site, queries ``get_posterior(name, prior)`` for a posterior
distribution, and draws the site's value from it — so guide structure
automatically mirrors model structure.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax

from .messenger import Messenger
from .runtime import am_i_wrapped, apply_stack
from .trace_struct import Trace
from .util import prune_subsample_sites, site_is_subsample


class GuideMessenger(Messenger):
    def __init__(self, model: Callable):
        super().__init__()
        self.model = model
        self._model_trace: Optional[Trace] = None
        self._guide_trace: Optional[Trace] = None

    def __call__(self, *args, **kwargs) -> Dict:
        """Draw posterior samples by running the model under this guide."""
        from .handlers import TraceMessenger

        self.args_kwargs = (args, kwargs)
        recorder = TraceMessenger()
        self._guide_recorder = recorder
        try:
            with recorder:
                with self:
                    self.model(*args, **kwargs)
        finally:
            del self.args_kwargs
            self._guide_recorder = None
        # recorded sites carry posterior fns; the model trace is a copy
        # with the prior fns restored, and the guide trace drops observed
        # sites (ref ``guide.py:148-158``)
        guide_trace = prune_subsample_sites(recorder.get_trace())
        model_trace = guide_trace.copy()
        for name, guide_site in list(guide_trace.nodes.items()):
            if (
                guide_site["type"] != "sample"
                or guide_site["is_observed"]
            ):
                del guide_trace.nodes[name]
                continue
            prior = guide_site["infer"].get("_prior_fn")
            if prior is not None:
                model_site = dict(model_trace.nodes[name])
                model_site["fn"] = prior
                model_trace.nodes[name] = model_site
        self._model_trace = model_trace
        self._guide_trace = guide_trace
        samples = {
            name: site["value"]
            for name, site in guide_trace.nodes.items()
            if site["type"] == "sample"
            and not site["is_observed"]
            and not site_is_subsample(site)
        }
        return samples

    def _pyro_sample(self, msg) -> None:
        if msg["is_observed"] or site_is_subsample(msg) or msg["done"]:
            return
        prior = msg["fn"]
        posterior = self.get_posterior(msg["name"], prior)
        msg["infer"] = dict(msg["infer"])
        msg["infer"]["_prior_fn"] = prior
        from ..distributions.distribution import Distribution

        if not isinstance(posterior, Distribution):
            # a raw array value: treat as a deterministic point
            from ..distributions.delta import Delta

            posterior = Delta(posterior, event_dim=prior.event_dim)
        msg["fn"] = posterior

    def get_posterior(self, name: str, prior):
        """Override: return a posterior distribution (or point value) for
        site ``name`` whose prior is ``prior``."""
        raise NotImplementedError

    def upstream_value(self, name: str):
        """Value of an upstream site in the current trace
        (ref ``guide.py:upstream_value``)."""
        from .runtime import _PYRO_STACK

        rec = getattr(self, "_guide_recorder", None)
        if rec is not None and name in rec.trace:
            return rec.trace.nodes[name]["value"]
        return None

    def get_traces(self) -> Tuple[Trace, Trace]:
        """(model_trace, guide_trace) from the last call
        (ref ``guide.py:get_traces``)."""
        if self._model_trace is None:
            raise RuntimeError("call the guide first")
        return self._model_trace, self._guide_trace
