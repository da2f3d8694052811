"""Structured-guide preconditioning for HMC (ref
``pyro/infer/reparam/structured.py``): after training an
:class:`~pyro_tpu.infer.autoguide.AutoStructured` guide, reparameterize
the model so its latents become deterministic functions of the guide's
(whitened, dependency-structured) auxiliary variables — a restricted
structured NeuTra.
"""

from __future__ import annotations

from ... import poutine
from ...distributions.delta import Delta
from ...poutine.messenger import Messenger
from .reparam import Reparam


class _AuxiliaryRename(Messenger):
    """Rename the guide's internal sample sites to ``{name}_aux`` and mark
    them auxiliary, so they register as the outer model's latents."""

    def _pyro_sample(self, msg):
        msg["name"] = msg["name"] + "_aux"
        msg["infer"] = dict(msg["infer"], is_auxiliary=True)


class StructuredReparam(Reparam):
    """Ref ``structured.py:25``.  All sites must share one instance; the
    model must have static structure."""

    def __init__(self, guide):
        from ...infer.autoguide.structured import AutoStructured

        if not isinstance(guide, AutoStructured):
            raise TypeError(
                "StructuredReparam expected an AutoStructured guide, "
                f"but got {type(guide)}"
            )
        self.guide = guide
        self.deltas = {}

    def _reparam_config(self, site):
        if (
            self.guide.prototype_trace is not None
            and site["name"] in self.guide.prototype_trace.nodes
            and not site["is_observed"]
        ):
            return self
        return None

    def reparam(self, fn=None):
        return poutine.reparam(fn, config=self._reparam_config)

    def apply(self, msg):
        name, fn, value, is_observed = (
            msg["name"],
            msg["fn"],
            msg["value"],
            msg["is_observed"],
        )
        if is_observed:
            raise NotImplementedError(
                f"At pyro.sample({name!r},...), StructuredReparam does "
                "not support observe statements"
            )
        if not self.deltas:  # first site: run the guide once per trace
            with _AuxiliaryRename():
                self.deltas = dict(self.guide())
        value = self.deltas.pop(name)
        new_fn = Delta(value, event_dim=fn.event_dim)
        return {"fn": new_fn, "value": value, "is_observed": True}
