"""Execution trace: an ordered map of site messages.

Ref ``pyro/poutine/trace_struct.py:40``.  The reference stores a DAG of
mutable Message dicts with memoized log-prob computation; here a ``Trace``
is an ordered dict of site dicts whose array leaves are JAX values, so the
whole structure can be produced inside a jitted function (site metadata is
static per model structure; values are tracers).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Iterator, Optional

import jax.numpy as jnp

from ..distributions.score_parts import ScoreParts
from ..distributions.util import scale_and_mask


class Trace:
    def __init__(self, graph_type: str = "flat") -> None:
        assert graph_type in ("flat", "dense")
        self.graph_type = graph_type
        self.nodes: "OrderedDict[str, Dict[str, Any]]" = OrderedDict()
        self._succ: Dict[Any, set] = {}
        self._pred: Dict[Any, set] = {}

    # -- container protocol -------------------------------------------------
    def __contains__(self, name: str) -> bool:
        return name in self.nodes

    def __iter__(self) -> Iterator[str]:
        return iter(self.nodes)

    def __len__(self) -> int:
        return len(self.nodes)

    def __getitem__(self, name: str) -> Dict[str, Any]:
        return self.nodes[name]

    def add_node(self, site_name: str, **kwargs: Any) -> None:
        """Ref ``trace_struct.py:121``."""
        if site_name in self.nodes:
            if kwargs["type"] != "param":
                raise RuntimeError(
                    f"Multiple {kwargs['type']} sites named '{site_name}'"
                )
        self.nodes[site_name] = kwargs

    def copy(self) -> "Trace":
        new = Trace(self.graph_type)
        new.nodes = OrderedDict(
            (name, dict(site)) for name, site in self.nodes.items()
        )
        new._succ = {k: set(v) for k, v in self._succ.items()}
        new._pred = {k: set(v) for k, v in self._pred.items()}
        return new

    # -- DAG structure (ref ``trace_struct.py:60-120,168-200``) --------------
    def _register(self, node) -> None:
        if node not in self._succ:
            self._succ[node] = set()
            self._pred[node] = set()
            if node not in self.nodes:
                self.nodes[node] = {"name": node, "type": None}

    def add_edge(self, n1, n2) -> None:
        """Directed edge n1 -> n2, creating placeholder nodes as needed."""
        self._register(n1)
        self._register(n2)
        self._succ[n1].add(n2)
        self._pred[n2].add(n1)

    def successors(self, node):
        return set(self._succ.get(node, ()))

    def predecessors(self, node):
        return set(self._pred.get(node, ()))

    @property
    def edges(self):
        return [
            (n1, n2) for n1, succ in self._succ.items() for n2 in succ
        ]

    def remove_node(self, node) -> None:
        for p in self._pred.get(node, ()):
            self._succ[p].discard(node)
        for s in self._succ.get(node, ()):
            self._pred[s].discard(node)
        self._succ.pop(node, None)
        self._pred.pop(node, None)
        self.nodes.pop(node, None)

    def _dfs(self, node, visited: set):
        if node in visited:
            return
        visited.add(node)
        yield node
        for s in self._succ.get(node, ()):
            yield from self._dfs(s, visited)

    def topological_sort(self, reverse: bool = False):
        """Kahn's algorithm over the edge DAG (ref
        ``trace_struct.py:topological_sort``)."""
        indeg = {n: len(self._pred.get(n, ())) for n in self._succ}
        ready = [n for n, d in indeg.items() if d == 0]
        out = []
        while ready:
            n = ready.pop()
            out.append(n)
            for s in sorted(self._succ.get(n, ()), key=repr):
                indeg[s] -= 1
                if indeg[s] == 0:
                    ready.append(s)
        if len(out) != len(indeg):
            raise ValueError("graph has a cycle")
        return list(reversed(out)) if reverse else out

    # -- log-prob machinery --------------------------------------------------
    def compute_log_prob(self, site_filter=lambda name, site: True) -> None:
        """Compute scaled+masked log_prob at each sample site.

        Ref ``trace_struct.py:248-289``.  Stores both the raw
        ``unscaled_log_prob`` and the scaled/masked ``log_prob`` plus the
        reduced ``log_prob_sum``.
        """
        from ..distributions.distribution import ExpandedDistribution

        for name, site in self.nodes.items():
            if site["type"] == "sample" and site_filter(name, site):
                if "log_prob" in site:
                    continue
                fn = site["fn"]
                if (
                    isinstance(fn, ExpandedDistribution)
                    and site["infer"].get("_enumerate_dim") is not None
                    and not site["is_observed"]
                ):
                    # Model-enumerated site under a lazy plate broadcast:
                    # keep the factor COMPACT (size-1 plate axes, squeezed
                    # by ``pack_tensors``) — the packed TVE engine is
                    # ordinal-aware, so constant-over-plate factors need
                    # not be materialized at plate shape.  Only sound for
                    # enum factors: ``log_prob_sum`` semantics (plate
                    # multiplicity) never apply to them directly.
                    base = fn.base_dist
                    while isinstance(base, ExpandedDistribution):
                        base = base.base_dist
                    lp = base.log_prob(
                        site["value"], *site["args"], **_lp_kwargs(site)
                    )
                    rank = max(
                        len(fn.batch_shape),
                        jnp.ndim(site["value"]) - fn.event_dim,
                    )
                    if jnp.ndim(lp) < rank:
                        lp = jnp.reshape(
                            lp, (1,) * (rank - jnp.ndim(lp)) + jnp.shape(lp)
                        )
                else:
                    lp = fn.log_prob(
                        site["value"], *site["args"], **_lp_kwargs(site)
                    )
                site["unscaled_log_prob"] = lp
                lp = scale_and_mask(lp, site["scale"], site["mask"])
                site["log_prob"] = lp
                site["log_prob_sum"] = jnp.sum(lp)

    def log_prob_sum(self, site_filter=lambda name, site: True):
        """Total log-density of the trace (ref ``trace_struct.py:203``)."""
        result = 0.0
        for name, site in self.nodes.items():
            if site["type"] == "sample" and site_filter(name, site):
                if "log_prob_sum" in site:
                    result = result + site["log_prob_sum"]
                else:
                    lp = site["fn"].log_prob(site["value"])
                    lp = scale_and_mask(lp, site["scale"], site["mask"])
                    site["log_prob_sum"] = jnp.sum(lp)
                    result = result + site["log_prob_sum"]
        return jnp.asarray(result)

    def compute_score_parts(self) -> None:
        """Compute the surrogate-gradient decomposition at each site.

        Ref ``trace_struct.py:290-330`` and ``score_parts.py:11``.
        """
        for name, site in self.nodes.items():
            if site["type"] == "sample" and "score_parts" not in site:
                parts = site["fn"].score_parts(
                    site["value"], *site["args"], **_lp_kwargs(site)
                )
                site["unscaled_log_prob"] = parts.log_prob
                parts = parts.scale_and_mask(site["scale"], site["mask"])
                site["score_parts"] = parts
                site["log_prob"] = parts.log_prob
                site["log_prob_sum"] = jnp.sum(parts.log_prob)

    # -- packed named-dim representation (enumeration engine) ----------------
    def symbolize_dims(self, plate_to_symbol=None) -> None:
        """Assign unique symbols to all plate and enum dims
        (ref ``trace_struct.py:398``): plates get even opt_einsum symbols,
        enum ids odd ones."""
        import opt_einsum

        plate_to_symbol = {} if plate_to_symbol is None else plate_to_symbol
        symbol_to_dim = {}
        for site in self.nodes.values():
            if site["type"] != "sample":
                continue
            dim_to_symbol = {}
            for frame in site["cond_indep_stack"]:
                if frame.dim is not None:
                    if frame.name not in plate_to_symbol:
                        plate_to_symbol[frame.name] = opt_einsum.get_symbol(
                            2 * len(plate_to_symbol)
                        )
                    symbol = plate_to_symbol[frame.name]
                    dim_to_symbol[frame.dim] = symbol
                    symbol_to_dim[symbol] = frame.dim
            for dim, id_ in site["infer"].get("_dim_to_id", {}).items():
                symbol = opt_einsum.get_symbol(1 + 2 * id_)
                dim_to_symbol[dim] = symbol
                symbol_to_dim[symbol] = dim
                if dim == site["infer"].get("_enumerate_dim"):
                    site["infer"]["_enumerate_symbol"] = symbol
            site["infer"]["_dim_to_symbol"] = dim_to_symbol
        self.plate_to_symbol = plate_to_symbol
        self.symbol_to_dim = symbol_to_dim

    def pack_tensors(self, plate_to_symbol=None) -> None:
        """Compute packed representations of log_prob/score_parts/mask at
        each site (ref ``trace_struct.py:435``)."""
        from ..ops import packed as packed_ops

        self.symbolize_dims(plate_to_symbol)
        for site in self.nodes.values():
            if site["type"] != "sample":
                continue
            dim_to_symbol = site["infer"]["_dim_to_symbol"]
            p = site["packed"] = {}
            mask = site["mask"]
            if mask is not None and not isinstance(mask, bool):
                p["mask"] = packed_ops.pack(mask, dim_to_symbol)
            else:
                p["mask"] = mask
            if "log_prob" in site:
                p["log_prob"] = packed_ops.pack(
                    site["log_prob"], dim_to_symbol
                )
                p["unscaled_log_prob"] = packed_ops.pack(
                    site["unscaled_log_prob"], dim_to_symbol
                )
            if "score_parts" in site:
                parts = site["score_parts"]
                from ..distributions.util import is_identically_zero

                p["score_parts"] = type(parts)(
                    p.get("log_prob"),
                    parts.score_function
                    if is_identically_zero(parts.score_function)
                    else packed_ops.pack(
                        parts.score_function, dim_to_symbol
                    ),
                    parts.entropy_term
                    if is_identically_zero(parts.entropy_term)
                    else packed_ops.pack(parts.entropy_term, dim_to_symbol),
                )

    # -- introspection -------------------------------------------------------
    def stochastic_nodes(self):
        return [
            name
            for name, site in self.nodes.items()
            if site["type"] == "sample" and not site["is_observed"]
        ]

    def observation_nodes(self):
        return [
            name
            for name, site in self.nodes.items()
            if site["type"] == "sample" and site["is_observed"]
        ]

    def param_nodes(self):
        return [n for n, s in self.nodes.items() if s["type"] == "param"]

    def iter_stochastic_nodes(self):
        for name, site in self.nodes.items():
            if site["type"] == "sample" and not site["is_observed"]:
                yield name, site

    def format_shapes(self, title: str = "Trace Shapes:") -> str:
        """Shape table for error messages (ref ``trace_struct.py:475``)."""
        rows = [[title, None]]
        for name, site in self.nodes.items():
            if site["type"] == "param":
                rows.append(
                    [name, tuple(getattr(site["value"], "shape", ()))]
                )
            elif site["type"] == "sample":
                fn = site["fn"]
                rows.append([f"{name} dist", tuple(fn.shape())])
                if site["value"] is not None:
                    rows.append(
                        [f"{name} value", tuple(site["value"].shape)]
                    )
        return "\n".join(
            f"{r[0]:>30} {r[1] if r[1] is not None else ''}" for r in rows
        )


def _lp_kwargs(site: Dict[str, Any]) -> Dict[str, Any]:
    # log_prob takes no extra kwargs in this framework; kept as a hook for
    # parity with the reference's *args/**kwargs passthrough.
    return {}
