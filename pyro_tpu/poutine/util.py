"""Poutine utilities (ref ``pyro/poutine/util.py``)."""

from __future__ import annotations


def site_is_subsample(site) -> bool:
    """Ref ``poutine/util.py:site_is_subsample``."""
    from .plate_messenger import _Subsample

    return site["type"] == "sample" and isinstance(site["fn"], _Subsample)


def site_is_factor(site) -> bool:
    from ..distributions.delta import Unit

    return site["type"] == "sample" and isinstance(site["fn"], Unit)


def prune_subsample_sites(trace):
    """Drop subsample-index sites from a trace
    (ref ``poutine/util.py:prune_subsample_sites``)."""
    trace = trace.copy()
    for name, site in list(trace.nodes.items()):
        if site_is_subsample(site):
            del trace.nodes[name]
    return trace


def all_escape(trace, msg) -> bool:
    return (
        msg["type"] == "sample"
        and not msg["is_observed"]
        and msg["name"] not in trace
    )


def discrete_escape(trace, msg) -> bool:
    return (
        msg["type"] == "sample"
        and not msg["is_observed"]
        and msg["name"] not in trace
        and getattr(msg["fn"], "has_enumerate_support", False)
    )


def enum_extend(trace, msg, num_samples=None):
    """Sequential-enumeration trace extension (ref ``util.py:enum_extend``)."""
    if num_samples is None:
        num_samples = -1
    extended_traces = []
    support = msg["fn"].enumerate_support()
    # supports may be arrays or python lists (e.g. HashingMarginal over
    # heterogeneous values like strings)
    n = len(support)
    count = n if num_samples < 0 else min(n, num_samples)
    for i in range(count):
        msg_copy = dict(msg)
        msg_copy["value"] = support[i]
        tr = trace.copy()
        tr.add_node(msg["name"], **msg_copy)
        extended_traces.append(tr)
    return extended_traces
