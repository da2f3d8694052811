"""Importance-trace construction (the SVI hot path).

Ref ``pyro/infer/enum.py:45`` (get_importance_trace) and ``:138``
(config_enumerate).
"""

from __future__ import annotations

from typing import Optional

import jax

from .. import poutine
from ..poutine.handlers import SeedMessenger
from ..poutine.util import prune_subsample_sites


def get_importance_trace(
    graph_type: str,
    max_plate_nesting: Optional[int],
    model,
    guide,
    args,
    kwargs,
    rng_key=None,
    detach: bool = False,
):
    """Run the guide, replay the model against it, return both traces.

    Ref ``infer/enum.py:45-87``.  RNG: the guide gets a seed handler so
    each sample site draws from a key folded with its name; the model is
    fully determined by the replay (observed sites need no keys).
    """
    if rng_key is None:
        from ..poutine.runtime import _next_eager_key

        rng_key = _next_eager_key()
    key_guide, key_model = jax.random.split(rng_key)

    from ..poutine.guide import GuideMessenger

    unwrapped_guide = guide
    while hasattr(unwrapped_guide, "_pyro_unwrapped"):
        unwrapped_guide = unwrapped_guide._pyro_unwrapped
    if isinstance(unwrapped_guide, GuideMessenger):
        # effect guide: one call produces both traces
        # (ref ``infer/enum.py:53-58``)
        if detach:
            raise NotImplementedError(
                "GuideMessenger does not support detach"
            )
        with SeedMessenger(rng_key=key_guide):
            guide(*args, **kwargs)
        model_trace, guide_trace = unwrapped_guide.get_traces()
    else:
        guide_fn = poutine.seed(rng_key=key_guide)(guide)
        guide_trace = poutine.trace(
            guide_fn, graph_type=graph_type
        ).get_trace(*args, **kwargs)
        if detach:
            guide_trace = _detach_trace_values(guide_trace)
        model_fn = poutine.seed(rng_key=key_model)(
            poutine.replay(model, trace=guide_trace)
        )
        model_trace = poutine.trace(
            model_fn, graph_type=graph_type
        ).get_trace(*args, **kwargs)

    from .util import is_validation_enabled

    if is_validation_enabled():
        from ..util import check_model_guide_match

        check_model_guide_match(model_trace, guide_trace, max_plate_nesting)

    guide_trace = prune_subsample_sites(guide_trace)
    model_trace = prune_subsample_sites(model_trace)

    model_trace.compute_log_prob()
    guide_trace.compute_score_parts()
    if is_validation_enabled() and max_plate_nesting is not None and (
        max_plate_nesting != float("inf")
    ):
        from ..util import check_site_shape

        for tr in (model_trace, guide_trace):
            for site in tr.nodes.values():
                if site["type"] == "sample":
                    check_site_shape(site, int(max_plate_nesting))
    return model_trace, guide_trace


def _detach_trace_values(trace):
    trace = trace.copy()
    for site in trace.nodes.values():
        if site["type"] == "sample" and site["value"] is not None:
            site["value"] = jax.lax.stop_gradient(site["value"])
    return trace


def config_enumerate(guide=None, default: str = "parallel", expand: bool = False, num_samples=None, tmc: str = "diagonal"):
    """Configure enumeration for all discrete sites (ref ``enum.py:138``)."""
    if guide is None:
        import functools

        return functools.partial(
            config_enumerate,
            default=default,
            expand=expand,
            num_samples=num_samples,
            tmc=tmc,
        )
    if default not in (None, "sequential", "parallel", "flat"):
        raise ValueError(f"invalid default value: {default}")

    def config_fn(msg):
        if msg["type"] != "sample" or msg["is_observed"]:
            return {}
        if type(msg["fn"]).__name__ == "_Subsample":
            return {}
        if num_samples is not None:
            # TMC local sampling configures ALL sites, continuous included
            # (ref ``enum.py:119-125``)
            return {
                "enumerate": msg["infer"].get("enumerate", default),
                "num_samples": msg["infer"].get("num_samples", num_samples),
                "expand": msg["infer"].get("expand", expand),
                "tmc": msg["infer"].get("tmc", tmc),
            }
        if not getattr(msg["fn"], "has_enumerate_support", False):
            return {}
        cfg = {"enumerate": msg["infer"].get("enumerate", default)}
        if expand:
            cfg["expand"] = True
        return cfg

    return poutine.infer_config(guide, config_fn=config_fn)


def iter_discrete_escape(trace, msg) -> bool:
    """Escape predicate for SEQUENTIAL enumeration (ref ``enum.py:16-22``):
    interrupt execution at the first sequentially-enumerated sample site
    that the partial trace has not yet fixed."""
    return (
        msg["type"] == "sample"
        and not msg["is_observed"]
        and msg["infer"].get("enumerate") == "sequential"
        and msg["name"] not in trace
    )


def iter_discrete_extend(trace, site):
    """Extend a partial trace with every support value of an escaped
    sequential site, recording ``_enum_total`` so the Dice weighting can
    correct for branch multiplicity (ref ``enum.py:25-42``)."""
    values = site["fn"].enumerate_support(expand=False)
    enum_total = int(values.shape[0])
    extended = []
    for i in range(enum_total):
        ext_site = dict(site)
        ext_site["infer"] = dict(site["infer"])
        ext_site["infer"]["_enum_total"] = enum_total
        ext_site["value"] = values[i]
        tr = trace.copy()
        tr.add_node(site["name"], **ext_site)
        extended.append(tr)
    return extended
